"""Quantized-serving A/B: fp32 vs bf16-weights vs int8 weight-only.

VERDICT r4 next#4. The edit-serving program (reverse diffusion T=8 +
composite + HiFi-GAN V1 vocode, flagship sizes) measured on the chip with
the two-K scan protocol at B=1 (latency regime — weights dominate HBM
bytes: the 20x256 DiffNet re-streams its full stack every diffusion step)
and B=16 (throughput regime — activations dominate). Variants:

* fp32: the shipped serving path;
* bf16: every float kernel cast to bf16 (half the weight reads; compute
  dtypes follow JAX promotion, matmuls stay f32-accumulated);
* int8: weight-only int8 (infer/quant.py), dequantized INSIDE the scan
  body with a loop-varying ~1e-12 scale epsilon so XLA cannot hoist the
  dequant out of the timing loop — the measurement then reflects the
  per-invocation weight path a real serving call pays. Whether int8 wins
  depends on XLA fusing the int8->f32 convert into the conv/matmul
  weight loads; if it materialises a float copy instead, int8 LOSES
  (int8 read + float write + float read) — a measured negative with that
  root cause is a valid outcome (BASELINE.md records it either way, per
  the fused-DiffNet precedent).

Also reports the numeric cost: max-abs mel delta of one int8 invocation
vs fp32 on identical inputs/keys (weight-only error only; the acceptance
MCD deltas live in the e2e acceptance harness).

Usage: python scripts/bench_quant_serving.py [--frames 512]
       [--batches 1,16] [--tiny]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_serving import (HOP, batch_inputs, build_programs,  # noqa: E402
                                   make_serve_k)


def make_serve_k_q(model, voc):
    """K-scan of the quantized serving program (dequant per iteration)."""
    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.infer.quant import dequantize_tree

    @partial(jax.jit, static_argnums=(10,))
    def serve_k(qparams, vqs, txt, mask, mel2ph, spk, ref, f0, uv, rng, k):
        def body(acc, key):
            eps = jax.random.uniform(key, (), minval=0.0, maxval=1e-12)
            params = dequantize_tree(qparams, scale_offset=eps)
            vps = dequantize_tree(vqs, scale_offset=eps)
            r = ref + eps
            out = model.apply(params, txt, mask, mel2ph, spk, r, f0, uv,
                              infer=True, use_pred_pitch=True, rng=key)
            comp = out["mel_out"] * mask + r * (1 - mask)
            wav = voc.apply(vps, comp)
            return acc + wav.astype(jnp.float32), None

        b, t = ref.shape[0], ref.shape[1]
        acc, _ = jax.lax.scan(body, jnp.zeros((b, t * HOP), jnp.float32),
                              jax.random.split(rng, k))
        return acc

    return serve_k


def two_k(serve_k, variables, vparams, ins, rng, k1, k2):
    import jax

    def timed(k):
        kr = jax.random.fold_in(rng, k)
        np.asarray(serve_k(variables, vparams, *ins, kr, k))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(serve_k(variables, vparams, *ins,
                               jax.random.fold_in(kr, i), k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    w1, w2 = timed(k1), timed(k2)
    return max(w2 - w1, 1e-9) / (k2 - k1)


def cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    def c(x):
        if np.issubdtype(np.asarray(x).dtype, np.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(c, tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batches", default="1,16")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend at config level (the env "
                         "var is overridden by the axon plugin)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # config-level forcing: the axon plugin overrides the
        # JAX_PLATFORMS env var, so only this works (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speech_editing_tpu.infer.quant import (max_quant_error,
                                                quantize_tree,
                                                quantized_bytes)
    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rs = np.random.RandomState(0)
    model, voc = build_programs(args.tiny)
    T = args.frames
    ins1 = batch_inputs(rs, 1, T)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        *ins1)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ins1[4])

    # perturb EVERY float leaf: DiffNet's output head is zero-initialised
    # (x0 prediction ≡ 0 at init), which would make the int8-vs-fp32 mel
    # delta degenerately 0; timings are unaffected by weight values
    def _perturb(tree, seed):
        prs = np.random.RandomState(seed)

        def p(x):
            a = np.asarray(x)
            if np.issubdtype(a.dtype, np.floating):
                return a + prs.randn(*a.shape).astype(a.dtype) * 0.02
            return a

        return jax.tree.map(p, tree)

    variables = _perturb(variables, 1)
    vparams = _perturb(vparams, 2)
    serve_fp = make_serve_k(model, voc)
    serve_q = make_serve_k_q(model, voc)

    qvars = {"params": quantize_tree(variables["params"])}
    vqs = quantize_tree(vparams)
    qerr = max(max_quant_error(variables["params"], qvars["params"]),
               max_quant_error(vparams, vqs))
    bytes_fp = quantized_bytes(variables["params"]) + quantized_bytes(vparams)
    bytes_q = quantized_bytes(qvars["params"]) + quantized_bytes(vqs)
    vars_bf = cast_tree(variables, jnp.bfloat16)
    vparams_bf = cast_tree(vparams, jnp.bfloat16)

    # numeric cost: one MEL-level invocation on identical inputs/keys
    # (wav magnitudes at random vocoder init are ~1e-8 — meaningless)
    from speech_editing_tpu.infer.quant import dequantize_tree

    rng = jax.random.PRNGKey(3)
    # arrays pass as ARGUMENTS — device-array closures poison the axon
    # process (CLAUDE.md)
    infer_once = jax.jit(lambda v, txt, mask, m2p, spk, ref, f0, uv, r:
                         model.apply(v, txt, mask, m2p, spk, ref, f0, uv,
                                     infer=True, use_pred_pitch=True,
                                     rng=r)["mel_out"])
    mel_fp = np.asarray(infer_once(variables, *ins1, rng))
    mel_q = np.asarray(infer_once(jax.jit(dequantize_tree)(qvars),
                                  *ins1, rng))
    mel_delta = float(np.abs(mel_fp - mel_q).max())

    rows = {}
    for b in [int(x) for x in args.batches.split(",")]:
        ins = batch_inputs(rs, b, T)
        row = {}
        for name, fn, v, vp in (
                ("fp32", serve_fp, variables, vparams),
                ("bf16", serve_fp, vars_bf, vparams_bf),
                ("int8", serve_q, qvars, vqs)):
            print(f"| measuring B={b} {name}", file=sys.stderr, flush=True)
            per = two_k(fn, v, vp, ins, jax.random.fold_in(rng, b), args.k1,
                        args.k2)
            row[name] = {"ms_per_batch": round(per * 1e3, 3),
                         "edits_per_sec": round(b / per, 2)}
        row["int8_vs_fp32"] = round(
            row["fp32"]["ms_per_batch"] / row["int8"]["ms_per_batch"], 3)
        row["bf16_vs_fp32"] = round(
            row["fp32"]["ms_per_batch"] / row["bf16"]["ms_per_batch"], 3)
        rows[b] = row

    b_lat = min(rows)
    print(json.dumps({
        "metric": "serving_quant_int8_speedup_b1",
        "value": rows[b_lat]["int8_vs_fp32"],
        "unit": (f"x vs fp32 at B={b_lat}, T={T} (diffusion T=8 + HiFi-GAN "
                 f"V1; weight-only int8, dequant-in-loop)"),
        "per_batch": rows,
        "max_weight_quant_err": round(qerr, 6),
        "param_bytes_fp32": bytes_fp,
        "param_bytes_int8": bytes_q,
        "mel_max_abs_delta_int8_vs_fp32": round(mel_delta, 6),
    }))


if __name__ == "__main__":
    main()
