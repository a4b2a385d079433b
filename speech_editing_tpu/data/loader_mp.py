"""Multiprocess batch producer with reusable shared-memory transport.

Parity surface + production fix: the reference feeds its trainer through
torch DataLoader worker processes (``ds_workers``, ``tasks/tts/
speech_base.py``); our single prefetch thread decodes ~1.1M mel frames/s
while the fused TPU train step consumes ~6M/s at the flagship batch size —
the input pipeline would throttle the chip ~4x on one core. Here N forked
workers decode + collate COMPLETE batches and hand them to the parent
through ``multiprocessing.shared_memory``: one memcpy into the segment,
one memcpy out — no pickling of the ~15MB payload through a pipe — so
input throughput scales with host cores.

Two deliberate lifecycle choices (both measured):

* the pool is PERSISTENT across epochs (fork once, tasks carry their
  epoch) — per-epoch spawn/teardown dominates short epochs;
* each worker owns a small ring of REUSED segments handed back by the
  parent via a free-slot queue — creating/unlinking a fresh 17MB segment
  per batch costs ~43ms in page faults vs ~8ms reused.

Workers never touch JAX (numpy-only dataset code) and re-open their own
IndexedDataset file handle after the fork — sharing the parent's fd across
processes would race on seek offsets.
"""

from __future__ import annotations

import multiprocessing as mp
from multiprocessing import shared_memory
from typing import Iterator, List, Optional, Sequence

import numpy as np

_ALIGN = 64


def _aligned(n: int) -> int:
    return (n + _ALIGN - 1) // _ALIGN * _ALIGN


def _reset_file_handles(dataset):
    """Drop pre-fork IndexedDataset handles so each worker re-opens its own
    fd (a shared fd races on seek offsets). In-memory item lists are kept;
    concat datasets recurse."""
    from speech_editing_tpu.data.indexed_dataset import IndexedDataset

    for sub in getattr(dataset, "datasets", [dataset]):
        if isinstance(getattr(sub, "indexed_ds", None), IndexedDataset):
            sub.indexed_ds = None


def _worker_main(dataset, wid: int, n_slots: int, task_q, result_q, free_q):
    _reset_file_handles(dataset)
    cur_epoch = -1
    slots: list[Optional[shared_memory.SharedMemory]] = [None] * n_slots
    try:
        while True:
            task = task_q.get()
            if task is None:
                break
            epoch, bid, idx = task
            try:
                if epoch != cur_epoch:
                    dataset.set_epoch(epoch)
                    cur_epoch = epoch
                batch = dataset.collater([dataset[i] for i in idx])
                arrays = {k: v for k, v in batch.items()
                          if isinstance(v, np.ndarray)}
                others = {k: v for k, v in batch.items()
                          if not isinstance(v, np.ndarray)}
                total = (sum(_aligned(a.nbytes) for a in arrays.values())
                         or _ALIGN)
                slot = free_q.get()  # bounds in-flight batches per worker
                if slot is None:  # close() poison while awaiting a slot
                    break
                shm = slots[slot]
                if shm is None or shm.size < total:
                    if shm is not None:
                        shm.close()
                        shm.unlink()
                    # 1.5x headroom so small growth doesn't re-create.
                    # Tracker bookkeeping (fork-shared tracker, set
                    # semantics): create registers, the worker's unlink at
                    # exit unregisters — exactly balanced, so no manual
                    # unregister calls anywhere (3.12's unlink() already
                    # unregisters; doubling up KeyErrors the tracker).
                    shm = shared_memory.SharedMemory(
                        create=True, size=int(total * 1.5))
                    slots[slot] = shm
                metas = {}
                offset = 0
                for k, a in arrays.items():
                    a = np.ascontiguousarray(a)
                    dst = np.ndarray(a.shape, a.dtype, buffer=shm.buf,
                                     offset=offset)
                    np.copyto(dst, a)  # memcpy; bytes-slice assign is ~10x slower
                    metas[k] = (tuple(a.shape), a.dtype.str, offset)
                    offset += _aligned(a.nbytes)
                    del dst
                result_q.put((bid, wid, slot, shm.name, metas, others, None))
            except Exception as e:  # surface worker errors in the parent
                import traceback

                result_q.put((bid, wid, None, None, None, None,
                              f"{e}\n{traceback.format_exc()}"))
    finally:
        for shm in slots:
            if shm is not None:
                shm.close()
                try:
                    shm.unlink()
                except FileNotFoundError:
                    pass


class MPBatchPool:
    """Persistent worker pool producing collated batches through shm."""

    def __init__(self, dataset, num_workers: int, prefetch: int = 2):
        try:
            # start the resource tracker BEFORE forking: children then share
            # the parent's tracker, so the worker's unlink() unregister
            # balances the parent's attach-time register (separate trackers
            # would each see half the events and warn about "leaks")
            from multiprocessing import resource_tracker

            resource_tracker.ensure_running()
        except Exception:
            pass
        ctx = mp.get_context("fork")
        self.num_workers = max(1, num_workers)
        self.n_slots = prefetch + 1
        self.task_q = ctx.Queue()
        self.result_q = ctx.Queue()
        self.free_qs = [ctx.Queue() for _ in range(self.num_workers)]
        for q in self.free_qs:
            for slot in range(self.n_slots):
                q.put(slot)
        self.workers = [
            ctx.Process(target=_worker_main,
                        args=(dataset, wid, self.n_slots, self.task_q,
                              self.result_q, self.free_qs[wid]),
                        daemon=True)
            for wid in range(self.num_workers)]
        for w in self.workers:
            w.start()
        self._attached: dict[str, shared_memory.SharedMemory] = {}
        self._slot_names: dict[tuple, str] = {}  # (wid, slot) -> shm name
        self._closed = False

    def _read_batch(self, wid, slot, shm_name, metas, others) -> dict:
        # a grown slot arrives under a NEW segment name: detach the
        # superseded (worker-unlinked) one or its pages stay resident in
        # the parent for the pool's lifetime
        prev = self._slot_names.get((wid, slot))
        if prev is not None and prev != shm_name:
            old = self._attached.pop(prev, None)
            if old is not None:
                old.close()
        self._slot_names[(wid, slot)] = shm_name
        shm = self._attached.get(shm_name)
        if shm is None:
            # NOTE: on 3.12 attaching re-registers the name with the
            # (fork-shared) tracker; registrations are a set, so this is a
            # no-op duplicate and the worker's unlink balances it
            shm = shared_memory.SharedMemory(name=shm_name)
            self._attached[shm_name] = shm
        batch = dict(others)
        for k, (shape, dtype, offset) in metas.items():
            view = np.ndarray(shape, dtype, buffer=shm.buf, offset=offset)
            batch[k] = np.array(view)  # copy out before releasing the slot
            del view
        self.free_qs[wid].put(slot)
        return batch

    def iter_epoch(self, batches: Sequence[List[int]], epoch: int
                   ) -> Iterator[dict]:
        n = len(batches)
        next_task = 0
        for _ in range(min(self.num_workers * self.n_slots, n)):
            self.task_q.put((epoch, next_task, batches[next_task]))
            next_task += 1

        pending: dict[int, dict] = {}
        next_out = 0
        while next_out < n:
            while next_out not in pending:
                try:
                    bid, wid, slot, shm_name, metas, others, err = \
                        self.result_q.get(timeout=30)
                except Exception:  # queue.Empty: check worker liveness
                    dead = [w.pid for w in self.workers if not w.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"data worker(s) died (pids {dead}) — batch "
                            f"{next_out} will never arrive (OOM kill?)")
                    continue  # workers alive, just a slow batch
                if err is not None:
                    raise RuntimeError(
                        f"data worker failed on batch {bid}: {err}")
                pending[bid] = self._read_batch(wid, slot, shm_name, metas,
                                                others)
                if next_task < n:
                    self.task_q.put((epoch, next_task, batches[next_task]))
                    next_task += 1
            yield pending.pop(next_out)
            next_out += 1

    def close(self):
        if self._closed:
            return
        self._closed = True
        for _ in self.workers:
            self.task_q.put(None)
        for q in self.free_qs:  # unblock a worker awaiting a slot mid-epoch
            q.put(None)
        for w in self.workers:
            w.join(timeout=5)
            if w.is_alive():
                w.terminate()
        for shm in self._attached.values():
            shm.close()
        self._attached.clear()


def iter_batches_mp(dataset, batches: Sequence[List[int]], epoch: int,
                    num_workers: int, prefetch: int = 2) -> Iterator[dict]:
    """One-shot convenience wrapper (owns a pool for a single epoch)."""
    pool = MPBatchPool(dataset, num_workers, prefetch)
    try:
        yield from pool.iter_epoch(batches, epoch)
    finally:
        pool.close()
