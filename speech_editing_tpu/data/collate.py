"""Pad-collation and token-bucketed batching (host-side numpy).

Parity surface: ``utils/commons/dataset_utils.py`` — collate_1d/2d (:20-52),
batch_by_size (:65-119).

TPU-first addition: every collate accepts ``size_multiple`` so padded batch
shapes land on a small set of bucket lengths — XLA compiles one program per
distinct shape, so rounding lengths up to (say) multiples of 32 frames caps
recompilation while wasting <2% compute in padding (everything downstream is
mask-aware).
"""

from __future__ import annotations

import sys
from typing import Callable, List, Optional, Sequence

import numpy as np


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple if multiple > 1 else n


def collate_1d(values: Sequence[np.ndarray], pad_idx=0, left_pad: bool = False,
               max_len: Optional[int] = None, size_multiple: int = 1) -> np.ndarray:
    """List of [T_i] arrays -> [B, T] padded."""
    size = max(len(v) for v in values) if max_len is None else max_len
    size = _round_up(size, size_multiple)
    res = np.full((len(values), size), pad_idx, dtype=np.asarray(values[0]).dtype)
    for i, v in enumerate(values):
        v = np.asarray(v)
        if left_pad:
            res[i, size - len(v):] = v
        else:
            res[i, : len(v)] = v
    return res


def collate_2d(values: Sequence[np.ndarray], pad_idx=0, left_pad: bool = False,
               max_len: Optional[int] = None, size_multiple: int = 1) -> np.ndarray:
    """List of [T_i, C] arrays -> [B, T, C] padded."""
    size = max(v.shape[0] for v in values) if max_len is None else max_len
    size = _round_up(size, size_multiple)
    v0 = np.asarray(values[0])
    res = np.full((len(values), size, v0.shape[1]), pad_idx, dtype=v0.dtype)
    for i, v in enumerate(values):
        v = np.asarray(v)
        if left_pad:
            res[i, size - v.shape[0]:] = v
        else:
            res[i, : v.shape[0]] = v
    return res


def collate_1d_or_2d(values, pad_idx=0, left_pad=False, max_len=None,
                     size_multiple: int = 1):
    if np.asarray(values[0]).ndim == 1:
        return collate_1d(values, pad_idx, left_pad, max_len, size_multiple)
    return collate_2d(values, pad_idx, left_pad, max_len, size_multiple)


def _is_batch_full(batch: list, num_tokens: int, max_tokens: int,
                   max_sentences: int) -> bool:
    if len(batch) == 0:
        return False
    return len(batch) == max_sentences or num_tokens > max_tokens


def batch_by_size(indices, num_tokens_fn: Callable[[int], int],
                  max_tokens: Optional[int] = None,
                  max_sentences: Optional[int] = None,
                  required_batch_size_multiple: int = 1) -> List[List[int]]:
    """Token-budgeted batches of dataset indices (greedy over the ordered
    index list; budget = batch_size * max-sample-len, like fairseq)."""
    max_tokens = max_tokens if max_tokens is not None else sys.maxsize
    max_sentences = max_sentences if max_sentences is not None else sys.maxsize
    bsz_mult = required_batch_size_multiple

    indices = np.asarray(list(indices), dtype=np.int64)
    sample_len = 0
    sample_lens: list[int] = []
    batch: list[int] = []
    batches: list[list[int]] = []
    for idx in indices:
        idx = int(idx)
        num_tokens = num_tokens_fn(idx)
        sample_lens.append(num_tokens)
        sample_len = max(sample_len, num_tokens)
        assert sample_len <= max_tokens, (
            f"sentence at index {idx} of size {sample_len} exceeds max_tokens "
            f"limit of {max_tokens}!")
        budget = (len(batch) + 1) * sample_len
        if _is_batch_full(batch, budget, max_tokens, max_sentences):
            mod_len = max(bsz_mult * (len(batch) // bsz_mult),
                          len(batch) % bsz_mult)
            batches.append(batch[:mod_len])
            batch = batch[mod_len:]
            sample_lens = sample_lens[mod_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches
