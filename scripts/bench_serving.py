"""Batched-serving throughput benchmark: region edits/sec/chip vs batch size.

The reference serves edits strictly one at a time
(``inference/tts/spec_denoiser.py:247-277``); the serving engine
(``infer/serving.py``) batches the device work under static bucket shapes.
This bench measures the batched device program — reverse diffusion (T=8,
flagship egs/spec_denoiser.yaml sizes) + composite + HiFi-GAN V1 vocode —
at B in {1, 8, 16}, T=512 frames (~5.9 s utterances), and reports
edits/s/chip and the batching speedup over B=1.

Timing protocol (CLAUDE.md / BASELINE.md): K iterations inside ONE jitted
``lax.scan``, full-output accumulation in the carry (defeats DCE), a large
device→host fetch as the completion barrier, two K values differenced to
cancel the tunnel round trip.

Usage: python scripts/bench_serving.py [--frames 512] [--batches 1,8,16]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=24)
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model

    sr, hop = 22050, 256
    T = args.frames
    dur_s = T * hop / sr
    vocab, s_txt = 80, 48
    # flagship egs/base.yaml serves with use_spk_embed: true — bench the
    # same program the serving engine runs (conditioner + spk projection)
    hp = dict(_flagship_hp(), use_spk_embed=True)
    model = build_model(vocab, hp)
    vhp = {"upsample_rates": [8, 8, 2, 2],
           "upsample_kernel_sizes": [16, 16, 4, 4],
           "upsample_initial_channel": 512, "resblock": "1",
           "resblock_kernel_sizes": [3, 7, 11],
           "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]]}
    voc = HifiGanGenerator(hp=vhp)

    rs = np.random.RandomState(0)

    def batch_inputs(b):
        txt = jnp.asarray(rs.randint(1, vocab, (b, s_txt)), jnp.int32)
        mel2ph = jnp.asarray(np.clip(np.sort(
            rs.randint(1, s_txt + 1, (b, T)), axis=-1), 1, s_txt), jnp.int32)
        mask = np.zeros((b, T, 1), np.float32)
        mask[:, T // 3: 2 * T // 3] = 1.0
        ref = jnp.asarray(rs.randn(b, T, 80) * 0.3 - 2, jnp.float32)
        f0 = jnp.asarray(rs.rand(b, T), jnp.float32)
        uv = jnp.zeros((b, T), jnp.float32)
        spk = jnp.asarray(rs.randn(b, 256) * 0.1, jnp.float32)
        return txt, jnp.asarray(mask), mel2ph, spk, ref, f0, uv

    txt1, mask1, m2p1, spk1, ref1, f01, uv1 = batch_inputs(1)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        txt1, mask1, m2p1, spk1, ref1, f01, uv1)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ref1)

    # NOTE: all arrays pass as ARGUMENTS (device-array closures poison the
    # process on this backend — CLAUDE.md).
    @partial(jax.jit, static_argnums=(10,))
    def serve_k(params, vps, txt, mask, mel2ph, spk, ref, f0, uv, rng, k):
        def body(acc, key):
            # per-iteration perturbation of the reference mel so XLA cannot
            # hoist any request-independent work out of the scan
            r = ref + jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
            # same flags as the shipped SpecDenoiserInfer._infer program
            # (use_pred_pitch runs the pitch predictor every request)
            out = model.apply(params, txt, mask, mel2ph, spk, r, f0, uv,
                              infer=True, use_pred_pitch=True, rng=key)
            comp = out["mel_out"] * mask + r * (1 - mask)
            wav = voc.apply(vps, comp)
            return acc + wav.astype(jnp.float32), None
        b = ref.shape[0]
        acc, _ = jax.lax.scan(body, jnp.zeros((b, T * hop), jnp.float32),
                              jax.random.split(rng, k))
        return acc

    rng = jax.random.PRNGKey(3)
    rows = {}
    base = None
    for b in [int(x) for x in args.batches.split(",")]:
        ins = batch_inputs(b)

        def timed(k):
            kr = jax.random.fold_in(rng, 1000 * b + k)
            np.asarray(serve_k(variables, vparams, *ins, kr, k))  # warm
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                np.asarray(serve_k(variables, vparams, *ins,
                                   jax.random.fold_in(kr, i), k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per_iter = max(timed(args.k2) - timed(args.k1), 1e-9) / (
            args.k2 - args.k1)
        eps = b / per_iter
        rows[b] = {"ms_per_batch": round(per_iter * 1e3, 3),
                   "edits_per_sec": round(eps, 2),
                   "audio_sec_per_sec": round(eps * dur_s, 1)}
        if base is None:
            base = eps
        rows[b]["speedup_vs_b1"] = round(eps / base, 2)

    bmax = max(rows)
    print(json.dumps({
        "metric": "serving_edits_per_sec_per_chip",
        "value": rows[bmax]["edits_per_sec"],
        "unit": f"edits/s (T={T} frames = {dur_s:.2f}s audio, diffusion T=8 "
                f"+ HiFi-GAN V1, batched B={bmax})",
        "batching_speedup": rows[bmax]["speedup_vs_b1"],
        "per_batch": rows,
    }))


if __name__ == "__main__":
    main()
