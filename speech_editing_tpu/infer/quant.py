"""Weight-only int8 quantization for serving programs.

Why weight-only: v5e's int8 MXU doubles peak over bf16 only when BOTH
operands are int8; activation quantization needs per-layer calibration
and model changes. Weight-only instead targets HBM traffic — kernels are
stored int8 with per-output-channel float32 scales (absmax symmetric) and
dequantized IN-GRAPH, so weight reads shrink 2x vs bf16 / 4x vs f32 while
activation numerics are untouched beyond the quantization error itself.
That matters where weights dominate the byte budget: small-batch
latency-serving of DiffNet (B=1 re-streams the full 15M-param stack per
diffusion step) and HiFi-GAN's HBM-bound generator. The A/B on real
hardware lives in ``scripts/bench_quant_serving.py``; BASELINE.md records
the outcome either way (measured negative results are kept, per the
fused-DiffNet precedent).

Representation: a quantized leaf becomes ``{"__q8__": int8[...],
"__scale__": f32[out]}`` inside the params pytree;
``dequantize_tree`` (pure jnp, call INSIDE jit) restores the dense
pytree so ``model.apply`` needs no changes. Reduction axes: every axis
except the last (flax kernels are ``[..., in, out]`` / ``[k, in, out]``
— per-OUTPUT-channel scales).

The reference has no quantized path at all (``hifigan.py:101-151`` runs
fp32 end to end).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

_QKEY, _SKEY = "__q8__", "__scale__"


def _is_qleaf(x: Any) -> bool:
    return isinstance(x, dict) and _QKEY in x


def quantize_tree(params: Any, min_size: int = 4096,
                  dtype: Optional[Any] = None) -> Any:
    """Host-side: absmax-symmetric int8 per-output-channel quantization of
    every floating kernel with ndim >= 2 and size >= ``min_size`` (biases,
    norms, and small tables stay exact). ``dtype`` sets the SCALE dtype,
    which is also the dequantized compute dtype (default float32 —
    every non-string field must be a jax-compatible array because the
    quantized tree is passed as a jit ARGUMENT)."""
    import jax

    scale_dtype = np.dtype(dtype) if dtype is not None else np.float32

    def q(leaf):
        arr = np.asarray(leaf)
        if (arr.ndim < 2 or arr.size < min_size
                or not np.issubdtype(arr.dtype, np.floating)):
            return arr
        red = tuple(range(arr.ndim - 1))
        absmax = np.abs(arr).max(axis=red)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0)
        q8 = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {_QKEY: q8, _SKEY: scale.astype(scale_dtype)}

    return jax.tree.map(q, params)


def dequantize_tree(qparams: Any, scale_offset: Any = None) -> Any:
    """In-graph (jnp) dequantization — call inside the jitted serving
    program so the int8->float convert rides the weight read instead of
    materialising a float copy ahead of time.

    ``scale_offset`` (scalar, e.g. ``uniform(key, (), 0, 1e-12)``) is a
    benchmarking lever: adding a loop-varying epsilon to every scale
    stops XLA hoisting the dequant out of a timing ``lax.scan``, so the
    K-scan measures the per-invocation weight path a real serving call
    pays (the value change is ~1e-12 relative — far below the int8
    quantization error itself)."""
    import jax

    def dq(leaf):
        if _is_qleaf(leaf):
            s = leaf[_SKEY] if scale_offset is None else (leaf[_SKEY]
                                                          + scale_offset)
            return leaf[_QKEY].astype(leaf[_SKEY].dtype) * s
        return leaf

    return jax.tree.map(dq, qparams, is_leaf=_is_qleaf)


def quantized_bytes(qparams: Any) -> int:
    """Total parameter bytes under the quantized representation."""
    import jax

    total = 0
    for leaf in jax.tree.leaves(
            qparams, is_leaf=_is_qleaf):
        if _is_qleaf(leaf):
            total += leaf[_QKEY].size + leaf[_SKEY].size * 4
        else:
            total += np.asarray(leaf).size * np.asarray(leaf).dtype.itemsize
    return total


def max_quant_error(params: Any, qparams: Any) -> float:
    """Max elementwise |w - dequant(q(w))| over quantized leaves (host)."""
    import jax

    p_leaves = jax.tree.leaves(params)
    q_leaves = jax.tree.leaves(qparams, is_leaf=_is_qleaf)
    assert len(p_leaves) == len(q_leaves)
    err = 0.0
    for p, q in zip(p_leaves, q_leaves):
        if _is_qleaf(q):
            deq = q[_QKEY].astype(np.float32) * q[_SKEY]
            err = max(err, float(
                np.abs(np.asarray(p, np.float32) - deq).max()))
    return err
