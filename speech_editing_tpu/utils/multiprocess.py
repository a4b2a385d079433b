"""Ordered multiprocess map + fire-and-forget saver pool (host tooling).

Parity surface: ``utils/commons/multiprocess_utils.py`` —
``multiprocess_run_tqdm`` (:84): stream (idx, result) pairs in input order
from a worker pool; ``init_ctx_func`` gives each worker a persistent context
(e.g. a loaded speaker encoder). Falls back to in-process execution when
``num_workers <= 1`` (simpler debugging, no fork overhead for small runs).
``ResultSaverPool`` mirrors the reference ``MultiprocessManager``
(add_job/drain) used by its test loop (``tasks/tts/speech_base.py:287``)
to overlap wav/plot file writes with inference.
"""

from __future__ import annotations

import os
import traceback
from typing import Any, Callable, Iterable, Optional

_WORKER_CTX: dict = {}
_WORKER_FN: Optional[Callable] = None
_WORKER_INIT: Optional[Callable] = None


def _worker_init(fn, init_ctx_func):
    global _WORKER_FN, _WORKER_CTX
    _WORKER_FN = fn
    if init_ctx_func is not None:
        _WORKER_CTX = init_ctx_func(os.getpid()) or {}


def _worker_run(payload):
    idx, kwargs = payload
    try:
        if _WORKER_CTX:
            kwargs = dict(kwargs, ctx=_WORKER_CTX)
        return idx, _WORKER_FN(**kwargs)
    except Exception:
        traceback.print_exc()
        return idx, None


class ResultSaverPool:
    """Fire-and-forget job pool for result writing (wav encode + matplotlib
    render) so file IO overlaps device inference — the reference
    ``MultiprocessManager`` surface (add_job / drain). Uses the *spawn*
    context: the parent has live XLA runtime threads, which ``fork`` would
    duplicate into a corrupt child. ``num_workers <= 1`` (e.g. this repo's
    1-CPU CI) runs jobs synchronously in-process."""

    def __init__(self, num_workers: Optional[int] = None):
        if num_workers is None:
            num_workers = int(os.getenv(
                "N_PROC", max(1, (os.cpu_count() or 2) - 1)))
        self.num_workers = int(num_workers)
        self._results: list = []
        self._futures: list = []
        self._pool = None
        if self.num_workers > 1:
            import multiprocessing as mp

            self._pool = mp.get_context("spawn").Pool(self.num_workers)

    def add_job(self, fn: Callable, args: tuple = ()):
        """fn must be a module-level (picklable) function."""
        if self._pool is None:
            try:
                self._results.append(fn(*args))
            except Exception:
                traceback.print_exc()
                self._results.append(None)
        else:
            self._futures.append(self._pool.apply_async(fn, args))

    def drain(self) -> list:
        """Wait for all jobs; returns their results (exceptions -> None)."""
        for f in self._futures:
            try:
                self._results.append(f.get())
            except Exception:
                traceback.print_exc()
                self._results.append(None)
        self._futures = []
        if self._pool is not None:
            self._pool.close()
            self._pool.join()
            self._pool = None
        out, self._results = self._results, []
        return out


def multiprocess_run_tqdm(fn: Callable, args: Iterable[dict],
                          num_workers: Optional[int] = None,
                          desc: str = "", init_ctx_func: Optional[Callable] = None,
                          ordered: bool = True):
    """Yield (idx, fn(**kwargs)) for each kwargs dict in args, in order."""
    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda x, **kw: x  # noqa: E731

    args = list(args)
    if num_workers is None:
        num_workers = int(os.getenv("N_PROC", max(1, (os.cpu_count() or 2) // 2)))
    if num_workers <= 1 or len(args) <= 1:
        ctx = init_ctx_func(0) if init_ctx_func is not None else None
        for i, kw in enumerate(tqdm(args, desc=desc)):
            try:
                if ctx:
                    kw = dict(kw, ctx=ctx)
                yield i, fn(**kw)
            except Exception:
                traceback.print_exc()
                yield i, None
        return

    import multiprocessing as mp

    ctx = mp.get_context("spawn" if os.name != "posix" else "fork")
    with ctx.Pool(num_workers, initializer=_worker_init,
                  initargs=(fn, init_ctx_func)) as pool:
        runner = pool.imap(_worker_run, list(enumerate(args))) if ordered \
            else pool.imap_unordered(_worker_run, list(enumerate(args)))
        for idx, res in tqdm(runner, total=len(args), desc=desc):
            yield idx, res
