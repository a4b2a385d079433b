"""Batched-serving benchmark: uniform-shape throughput AND mixed traffic.

The reference serves edits strictly one at a time
(``inference/tts/spec_denoiser.py:247-277``); the serving engine
(``infer/serving.py``) batches the device work under static bucket shapes.
Two modes:

* default (uniform): the batched device program — reverse diffusion (T=8,
  flagship egs/spec_denoiser.yaml sizes) + composite + HiFi-GAN V1 vocode —
  at B in {1, 8, 16} and one frame count; reports edits/s/chip and the
  batching speedup over B=1.
* ``--mixed``: a request stream with lengths drawn from a lognormal
  duration distribution (median ~5.5 s, clipped to [1, 17+] s — the
  LibriTTS-like long-read regime the bucket set (128..1536) was sized
  for), grouped by the REAL server bucketing code (``infer/serving._bucket``
  + max_batch chunking). Each distinct bucket's batch program is timed
  honestly on-chip; the serving timeline (chunks processed in the server's
  order) then yields edits/s for the mix plus p50/p99 request latency and
  the cold-compile vs warm split per bucket. Chunks replicate-pad to
  max_batch (server semantics), so a partially-filled chunk costs a full
  batch — the mix number includes that waste, unlike the uniform mode.

Timing protocol (CLAUDE.md / BASELINE.md): K iterations inside ONE jitted
``lax.scan``, full-output accumulation in the carry (defeats DCE), a large
device→host fetch as the completion barrier, two K values differenced to
cancel the tunnel round trip. Compile (cold) cost is measured separately
as first-call wall time minus one warm call.

Usage:
  python scripts/bench_serving.py [--frames 512] [--batches 1,8,16]
  python scripts/bench_serving.py --mixed [--n-requests 64] [--max-batch 16]
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

SR, HOP = 22050, 256
VOCAB, S_TXT = 80, 48


def build_programs():
    import jax

    from __graft_entry__ import _flagship_hp
    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model

    # flagship egs/base.yaml serves with use_spk_embed: true — bench the
    # same program the serving engine runs (conditioner + spk projection)
    hp = dict(_flagship_hp(), use_spk_embed=True)
    model = build_model(VOCAB, hp)
    vhp = {"upsample_rates": [8, 8, 2, 2],
           "upsample_kernel_sizes": [16, 16, 4, 4],
           "upsample_initial_channel": 512, "resblock": "1",
           "resblock_kernel_sizes": [3, 7, 11],
           "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]]}
    voc = HifiGanGenerator(hp=vhp)
    return model, voc


def batch_inputs(rs, b, t):
    import jax.numpy as jnp

    txt = jnp.asarray(rs.randint(1, VOCAB, (b, S_TXT)), jnp.int32)
    mel2ph = jnp.asarray(np.clip(np.sort(
        rs.randint(1, S_TXT + 1, (b, t)), axis=-1), 1, S_TXT), jnp.int32)
    mask = np.zeros((b, t, 1), np.float32)
    mask[:, t // 3: 2 * t // 3] = 1.0
    ref = jnp.asarray(rs.randn(b, t, 80) * 0.3 - 2, jnp.float32)
    f0 = jnp.asarray(rs.rand(b, t), jnp.float32)
    uv = jnp.zeros((b, t), jnp.float32)
    spk = jnp.asarray(rs.randn(b, 256) * 0.1, jnp.float32)
    return txt, jnp.asarray(mask), mel2ph, spk, ref, f0, uv


def make_serve_k(model, voc):
    import jax
    import jax.numpy as jnp

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

        b, t = ref.shape[0], ref.shape[1]
        acc, _ = jax.lax.scan(body, jnp.zeros((b, t * HOP), jnp.float32),
                              jax.random.split(rng, k))
        return acc

    return serve_k


def measure_bucket(serve_k, variables, vparams, rs, b, t, k1, k2, rng):
    """(warm ms/batch via K-scan delta, cold-compile seconds)."""
    import jax

    ins = batch_inputs(rs, b, t)

    def timed(k, first=False):
        kr = jax.random.fold_in(rng, 1000 * b + 7 * t + k)
        t0 = time.perf_counter()
        np.asarray(serve_k(variables, vparams, *ins, kr, k))  # warm/compile
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(serve_k(variables, vparams, *ins,
                               jax.random.fold_in(kr, i), k))
            ts.append(time.perf_counter() - t0)
        return min(ts), compile_s - min(ts)

    w1, c1 = timed(k1)
    w2, c2 = timed(k2)
    per_iter = max(w2 - w1, 1e-9) / (k2 - k1)
    return per_iter, c1 + c2


def run_uniform(args):
    import jax

    rs = np.random.RandomState(0)
    model, voc = build_programs()
    serve_k = make_serve_k(model, voc)
    T = args.frames
    dur_s = T * HOP / SR
    ins1 = batch_inputs(rs, 1, T)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        *ins1)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ins1[4])

    rng = jax.random.PRNGKey(3)
    rows = {}
    base = None
    for b in [int(x) for x in args.batches.split(",")]:
        per_iter, _ = measure_bucket(serve_k, variables, vparams, rs, b, T,
                                     args.k1, args.k2, rng)
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


def run_mixed(args):
    import jax

    from speech_editing_tpu.infer.serving import _bucket

    buckets = tuple(int(x) for x in args.buckets.split(","))
    mb = args.max_batch

    # request stream: lognormal durations (median ~5.5 s, sigma 0.45),
    # clipped to >= 1 s — a long-read TTS/audiobook regime; lengths land
    # across the whole bucket set incl. the >last-bucket overflow path
    rs_len = np.random.RandomState(args.seed)
    dur = np.exp(rs_len.normal(np.log(5.5), 0.45, args.n_requests))
    frames = np.maximum((dur * SR / HOP).astype(int), 90)

    # REAL server grouping: smallest bucket that fits, chunks of the
    # budgeted per-bucket batch, processed in sorted bucket order
    # (infer/serving.py edit_many; frames_batch_budget caps batch x frames
    # per program — B=16 x T=1536 exceeds the v5e compile helper)
    def eff_mb(t_b):
        if args.frames_batch_budget <= 0:
            return mb
        e = max(1, min(mb, args.frames_batch_budget // t_b))
        return 1 << (e.bit_length() - 1)  # pow2 floor, matching the server

    def pow2ceil(n):
        return 1 << max(n - 1, 0).bit_length()

    groups = {}
    for i, t in enumerate(frames):
        groups.setdefault(_bucket(int(t), buckets), []).append(i)
    chunks = []  # (bucket, batch_size, n_real_requests)
    for t_b, idxs in sorted(groups.items()):
        e = eff_mb(t_b)
        for c in range(0, len(idxs), e):
            n_real = len(idxs[c: c + e])
            b_eff = (pow2ceil(n_real) if args.adaptive_tail and n_real < e
                     else e)
            chunks.append((t_b, b_eff, n_real))

    rs = np.random.RandomState(0)
    model, voc = build_programs()
    serve_k = make_serve_k(model, voc)
    ins1 = batch_inputs(rs, 1, 128)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        *ins1)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ins1[4])
    rng = jax.random.PRNGKey(3)

    per_bucket = {}
    failed = []
    for t_b, b_eff in sorted({(t, b) for t, b, _ in chunks}):
        print(f"| bucket T={t_b}: measuring (B={b_eff})",
              file=sys.stderr, flush=True)
        for attempt in (1, 2):
            try:
                warm_s, cold_s = measure_bucket(
                    serve_k, variables, vparams, rs, b_eff, t_b,
                    args.k1, args.k2, rng)
                per_bucket[(t_b, b_eff)] = {
                    "ms_per_batch_warm": round(warm_s * 1e3, 3),
                    "cold_compile_s": round(cold_s, 1),
                    "batch": b_eff}
                break
            except Exception as e:  # transient remote-compile failures
                print(f"| bucket T={t_b} B={b_eff} attempt {attempt} "
                      f"failed: {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
        else:
            failed.append((t_b, b_eff))
    if failed:
        # no silent caps: drop the failed programs' chunks from the
        # timeline and SAY so in the output
        chunks = [(t, b, n) for t, b, n in chunks
                  if (t, b) not in failed]

    # serving timeline: all requests arrive at t=0 (edit_many batch mode);
    # chunks run sequentially on the one chip in server order; a request's
    # latency is its chunk's completion time. Replicate-padding means every
    # chunk costs a full max_batch batch.
    now = 0.0
    lat = []
    audio_s = 0.0
    fill_num = fill_den = 0
    for t_b, b_eff, n_real in chunks:
        now += per_bucket[(t_b, b_eff)]["ms_per_batch_warm"] / 1e3
        lat.extend([now] * n_real)
        # audio seconds generated = real requests * their bucket duration
        audio_s += n_real * t_b * HOP / SR
        fill_num += n_real
        fill_den += b_eff
    lat = np.asarray(lat)
    total_s = now
    n_served = sum(n for _, _, n in chunks)
    eps = n_served / total_s
    cold_total = sum(v["cold_compile_s"] for v in per_bucket.values())
    fill = fill_num / max(fill_den, 1)

    print(json.dumps({
        "metric": "serving_mixed_edits_per_sec_per_chip",
        "value": round(eps, 2),
        "unit": (f"edits/s ({len(frames)} lognormal-length requests, "
                 f"median {np.median(dur):.1f}s audio, buckets {buckets}, "
                 f"max_batch={mb}, diffusion T=8 + HiFi-GAN V1)"),
        "latency_ms": {"p50": round(float(np.percentile(lat, 50)) * 1e3, 1),
                       "p99": round(float(np.percentile(lat, 99)) * 1e3, 1),
                       "max": round(float(lat.max()) * 1e3, 1)},
        "audio_sec_per_sec": round(audio_s / total_s, 1),
        "chunk_fill": round(fill, 3),
        "n_chunks": len(chunks),
        "cold_compile_s_total": round(cold_total, 1),
        "adaptive_tail": bool(args.adaptive_tail),
        "per_bucket": {f"T{t}xB{b}": v for (t, b), v in per_bucket.items()},
        "failed_buckets": [list(x) for x in failed],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=24)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--n-requests", dest="n_requests", type=int, default=64)
    ap.add_argument("--max-batch", dest="max_batch", type=int, default=16)
    ap.add_argument("--buckets", default="128,256,512,1024,1536")
    ap.add_argument("--frames-batch-budget", dest="frames_batch_budget",
                    type=int, default=16384)
    ap.add_argument("--adaptive-tail", dest="adaptive_tail",
                    action="store_true")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.mixed:
        run_mixed(args)
    else:
        run_uniform(args)


if __name__ == "__main__":
    main()
