"""Hardware numerics check for the flash-attention wrapper (TPU).

Compares ``ops.flash_attention.flash_mha`` (blockwise Pallas kernel) against
the einsum softmax path on valid rows, forward and backward, at the
transformer stack's head geometry (h=2, d=96). Run on a TPU host:

    python scripts/check_flash.py

Expected: fwd max-err 0 (same MXU contractions), grad max-err < 1e-2
(the kernel's bf16-internal recompute). CPU CI cannot run Mosaic kernels;
this script is the kernel's acceptance test (see
tests/test_flash_attention.py for what IS covered on CPU).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.ops.flash_attention import flash_mha

    assert jax.default_backend() in ("tpu",), (
        f"needs a TPU backend, got {jax.default_backend()}")
    rs = np.random.RandomState(0)
    failures = []
    for (b, tq, tk, h, d) in [(2, 96, 96, 2, 96), (3, 512, 512, 2, 96),
                              (2, 512, 96, 2, 96)]:
        q = rs.randn(b, tq, h, d).astype(np.float32) * 0.3
        k = rs.randn(b, tk, h, d).astype(np.float32) * 0.3
        v = rs.randn(b, tk, h, d).astype(np.float32)
        pad = np.zeros((b, tk), bool)
        for i in range(b):
            pad[i, tk - 1 - 7 * i:] = True
        qv = np.ones((b, tq), bool)

        def ref(q, k, v):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits + jnp.where(jnp.asarray(pad), -1e9, 0.0)[:, None, None, :]
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)

        o_ref = np.asarray(jax.jit(ref)(q, k, v))
        o_fl = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), jnp.asarray(pad)))
        fwd_err = float(np.abs((o_fl - o_ref) * qv[:, :, None, None]).max())

        mask = jnp.asarray(qv[:, :, None, None].astype(np.float32))

        def loss(fn, q, k, v):
            return jnp.sum(fn(q, k, v) * mask)

        g_fl = jax.jit(jax.grad(
            lambda q, k, v: loss(lambda *a: flash_mha(*a, jnp.asarray(pad)),
                                 q, k, v), argnums=(0, 1, 2)))(q, k, v)
        g_rf = jax.jit(jax.grad(
            lambda q, k, v: loss(ref, q, k, v), argnums=(0, 1, 2)))(q, k, v)
        gerr = max(float(jnp.abs(a - r).max()) for a, r in zip(g_fl, g_rf))
        ok = fwd_err < 1e-5 and gerr < 1e-2
        print(f"B={b} Tq={tq} Tk={tk}: fwd={fwd_err:.2e} grad={gerr:.2e} "
              f"{'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append((b, tq, tk, fwd_err, gerr))
    if failures:
        raise SystemExit(f"flash check FAILED: {failures}")
    print("flash attention hardware check: ALL OK")


if __name__ == "__main__":
    main()
