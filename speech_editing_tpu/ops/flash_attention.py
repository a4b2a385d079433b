"""Flash (blockwise, O(T) memory) multi-head attention for the FFT stacks.

TPU-first replacement for the einsum softmax-attention path in
``modules/transformer.py::MultiheadAttention`` (reference surface:
``modules/commons/transformer.py:138-486``'s MultiheadAttention). The naive
path materializes the ``[B, h, Tq, Tk]`` logits and probability tensors in
HBM on both passes; at the flagship decoder sizes (B=80, T=512..1548) those
tensors dominate the attention HBM traffic. The blockwise kernel keeps the
running softmax statistics in VMEM and never writes the ``TxT``
intermediates, with a matching custom-VJP backward.

We drive ``jax.experimental.pallas.ops.tpu.flash_attention`` (a Pallas TPU
kernel that ships with JAX) behind this module's mask/padding semantics:

* key-padding masks (bool ``[B, T]``, True = pad) become segment ids
  (valid=1, pad=0) so pad keys are excluded exactly — same semantics as the
  einsum path's additive ``NEG_INF`` bias. Pad *query* rows produce
  garbage in both paths and are multiplied out by the callers' ``nonpad``
  masks.
* sequence lengths are padded host-side to the 128-lane grid the kernel
  needs, and the pad tail is masked via the same segment ids.

Enable/disable globally with :func:`set_flash_enabled`; the default is
auto (on when the backend is TPU). ``tests/test_flash_attention.py``
checks numerics against the einsum path under Pallas interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_FORCED: Optional[bool] = None


def set_flash_enabled(value: Optional[bool]) -> None:
    """Force flash attention on/off; ``None`` restores auto-detection."""
    global _FORCED
    _FORCED = value


def flash_enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("SET_FLASH_ATTENTION", "").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises
        return False


def _pad_len(t: int, multiple: int = 128) -> int:
    return -(-t // multiple) * multiple


def padding_to_segments(key_padding_mask, b: int, tq: int, tk: int,
                        tq_p: int, tk_p: int):
    """Mask/padding -> (q_valid, kv_valid) int32 segment-id arrays.

    Semantics mirrored from the einsum path's additive NEG_INF bias: every
    real query row gets segment 1 (pad *query* rows produce garbage on both
    paths and are multiplied out by callers), keys marked pad — plus the
    host-side tail padding to the kernel grid — get segment 0 and are
    excluded exactly.
    """
    q_valid = jnp.pad(jnp.ones((b, tq), jnp.int32), ((0, 0), (0, tq_p - tq)))
    if key_padding_mask is not None:
        kv_valid = 1 - key_padding_mask.astype(jnp.int32)
    else:
        kv_valid = jnp.ones((b, tk), jnp.int32)
    kv_valid = jnp.pad(kv_valid, ((0, 0), (0, tk_p - tk)))
    return q_valid, kv_valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bhtd(q, k, v, q_valid, kv_valid, interpret=False):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, h, tq, d = q.shape
    tk = k.shape[2]
    blk_q = min(512, tq)
    blk_k = min(512, tk)
    sizes = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k,
        block_k_dkv=blk_k, block_q_dkv=blk_q,
        block_k_major_dq=blk_k, block_k_dq=blk_k, block_q_dq=blk_q,
    )
    seg = SegmentIds(q=q_valid.astype(jnp.int32),
                     kv=kv_valid.astype(jnp.int32))
    ctx = None
    if interpret:  # CPU correctness tests run the kernel interpreted
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
    try:
        out = flash_attention(q, k, v, segment_ids=seg, causal=False,
                              sm_scale=1.0, block_sizes=sizes)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    return out


def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              key_padding_mask: Optional[jax.Array] = None,
              interpret: bool = False) -> jax.Array:
    """Blockwise softmax attention over ``[B, T, h, d]`` tensors.

    ``q`` is expected pre-scaled (callers multiply by ``d**-0.5`` exactly as
    on the einsum path). ``key_padding_mask`` is bool ``[B, Tk]`` with True
    marking pad keys. Returns ``[B, Tq, h, d]`` in ``q``'s dtype.
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]
    tq_p, tk_p = _pad_len(max(tq, 128)), _pad_len(max(tk, 128))

    def pad_t(x, t_to):
        return jnp.pad(x, ((0, 0), (0, t_to - x.shape[1]), (0, 0), (0, 0)))

    qt = pad_t(q, tq_p).transpose(0, 2, 1, 3)
    kt = pad_t(k, tk_p).transpose(0, 2, 1, 3)
    vt = pad_t(v, tk_p).transpose(0, 2, 1, 3)

    q_valid, kv_valid = padding_to_segments(key_padding_mask, b, tq, tk,
                                            tq_p, tk_p)

    out = _flash_bhtd(qt, kt, vt, q_valid, kv_valid, interpret=interpret)
    return out.transpose(0, 2, 1, 3)[:, :tq].astype(q.dtype)
