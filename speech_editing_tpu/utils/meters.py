"""Meters, timers and profiling helpers.

Parity surface: ``utils/commons/meters.py`` — AvgrageMeter (:5), the
``Timer`` context manager with device sync and keyed cumulative wall-time
(:21-42, reference syncs CUDA; here we ``block_until_ready`` outstanding
work). TPU extension: :func:`profile_trace` wraps ``jax.profiler.trace`` so
any code region can be captured for TensorBoard's profiler.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class AvgrageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.cnt = 0

    def update(self, val, n: int = 1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


_sync_fn = None


def _device_sync():
    """Barrier over previously dispatched device work.

    A bare ``device_put`` only rides the transfer stream; blocking on a
    tiny COMPILED program works because device programs execute in
    dispatch order — it completes only after everything enqueued before
    it (the ``torch.cuda.synchronize`` parity the reference Timer needs,
    meters.py:21-42).
    """
    global _sync_fn
    import jax

    if _sync_fn is None:
        import jax.numpy as jnp

        _sync_fn = jax.jit(lambda: jnp.zeros(()))
    jax.block_until_ready(_sync_fn())


class Timer:
    timer_map: dict = {}

    def __init__(self, name: str, enable: bool = False):
        if name not in Timer.timer_map:
            Timer.timer_map[name] = 0.0
        self.name = name
        self.enable = enable

    def __enter__(self):
        if self.enable:
            _device_sync()
            self.t = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.enable:
            _device_sync()
            Timer.timer_map[self.name] += time.time() - self.t
            print(f"[Timer] {self.name}: {Timer.timer_map[self.name]:.4f}s")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed region (no-op if
    log_dir is falsy). View with TensorBoard's profile plugin."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class Tee:
    """Mirror stdout to a log file (reference trainer.py:27-42)."""

    def __init__(self, fn: str, mode: str = "a"):
        import sys

        self.file = open(fn, mode)
        self.stdout = sys.stdout
        sys.stdout = self

    def close(self):
        import sys

        sys.stdout = self.stdout
        self.file.close()

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)
        self.flush()

    def flush(self):
        self.file.flush()
