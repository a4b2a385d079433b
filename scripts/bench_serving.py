"""Batched-serving benchmark: uniform throughput, mixed traffic, ONLINE load.

The reference serves edits strictly one at a time
(``inference/tts/spec_denoiser.py:247-277``); the serving engine
(``infer/serving.py``) batches the device work under static bucket shapes,
and ``infer/online.py`` adds arrival-aware continuous batching. Four modes:

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

* ``--online --rate R``: the REAL ``OnlineEditServer`` under a Poisson
  arrival process on the chip — synthetic requests (host g2p/f0 excluded,
  as in the other modes) submitted at exponential inter-arrival times,
  full two-stage pipeline (dur inpainting -> reverse diffusion ->
  vocode), deadline scheduler, ``warmup()`` first (timed — the cold-start
  story). Latencies are wall-clock from submit to the result's
  device->host fetch, so they are QUEUE-INCLUSIVE and also include the
  axon tunnel's ~40 ms round trip per device program — honest for a
  network-attached chip, conservative vs on-host serving.
* ``--online --virtual --rates R1,R2,..``: the same scheduler code driven
  by a VIRTUAL clock whose chunk service times are measured on-chip with
  the two-K scan protocol (tunnel-free) — the latency-throughput curve at
  several offered loads without the tunnel constant. adaptive_tail is
  forced off here (its pow2-ladder times are not measured); merging
  changes no program shapes so it simulates exactly.

Timing protocol (CLAUDE.md / BASELINE.md): K iterations inside ONE jitted
``lax.scan``, full-output accumulation in the carry (defeats DCE), a large
device→host fetch as the completion barrier, two K values differenced to
cancel the tunnel round trip. Compile (cold) cost is measured separately
as first-call wall time minus one warm call.

Usage:
  python scripts/bench_serving.py [--frames 512] [--batches 1,8,16]
  python scripts/bench_serving.py --mixed [--n-requests 64] [--max-batch 16]
  python scripts/bench_serving.py --online --rate 40 [--duration 20]
  python scripts/bench_serving.py --online --virtual --rates 35,56,67
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


def build_programs(tiny: bool = False):
    import jax

    from __graft_entry__ import _flagship_hp
    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model

    # flagship egs/base.yaml serves with use_spk_embed: true — bench the
    # same program the serving engine runs (conditioner + spk projection).
    # tiny=True is a CPU smoke-test configuration, never a reported number.
    hp = dict(_flagship_hp(tiny=tiny), use_spk_embed=True)
    model = build_model(VOCAB, hp)
    vhp = {"upsample_rates": [8, 8, 2, 2],
           "upsample_kernel_sizes": [16, 16, 4, 4],
           "upsample_initial_channel": 16 if tiny else 512, "resblock": "1",
           "resblock_kernel_sizes": [3] if tiny else [3, 7, 11],
           "resblock_dilation_sizes": ([[1, 3]] if tiny
                                       else [[1, 3, 5]] * 3)}
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


# -- online (arrival-process) modes -------------------------------------------

def synth_online_item(rs, n_frames: int, name: str) -> dict:
    """Synthetic PREPROCESSED request item (the fields
    ``SpecDenoiserInfer.preprocess_input`` would produce): W words x 2
    phones, monotonic alignment, the middle word edited into two words.
    Values are inert; shapes/alignment drive the real pipeline."""
    n_frames = int(n_frames)
    W = max(4, n_frames // 24)          # ~24 frames per word
    S = 2 * W
    ph2word = np.repeat(np.arange(1, W + 1), 2).astype(np.int64)
    w0 = W // 2                          # 1-indexed middle word
    edited_ph2word = np.repeat(np.arange(1, W + 2), 2).astype(np.int64)
    s_edit = 2 * (W + 1)
    mel2ph = np.minimum(np.arange(n_frames) * S // n_frames + 1, S
                        ).astype(np.int64)
    return {
        "item_name": name, "ph": name,
        "ph2word": ph2word, "edited_ph2word": edited_ph2word,
        "ph_token": rs.randint(1, VOCAB, S).astype(np.int64),
        "edited_ph_token": rs.randint(1, VOCAB, s_edit).astype(np.int64),
        "words_region": [(w0, w0)], "edited_words_region": [(w0, w0 + 1)],
        "mel2ph": mel2ph, "mel2word": ph2word[mel2ph - 1],
        "dur": np.bincount(mel2ph, minlength=S + 1)[1:].astype(np.int64),
        "f0": rs.rand(n_frames).astype(np.float32),
        "uv": np.zeros(n_frames, np.float32),
        "mel": (rs.randn(n_frames, 80) * 0.3 - 2).astype(np.float32),
        "wav": np.zeros(16, np.float32),
    }


def build_infer_adapter(tiny=False):
    """SpecDenoiserInfer-shaped adapter over the flagship programs: real
    jitted device stages, synthetic host preprocessing."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from speech_editing_tpu.models.spec_denoiser.spec_denoiser import \
        GaussianDiffusion

    model, voc = build_programs(tiny)
    rs = np.random.RandomState(0)
    ins1 = batch_inputs(rs, 1, 128)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        *ins1)
    vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ins1[4])
    apply_voc = jax.jit(voc.apply)

    class _Voc:
        device_batched = True

        def spec2wav_batch(self, mels):
            return np.asarray(apply_voc(vparams, jnp.asarray(mels,
                                                             jnp.float32)))

        def spec2wav_batch_dev(self, mels_dev):
            return apply_voc(vparams, mels_dev)

    class _BenchInfer:
        _token_field = "edited_ph_token"
        hp = dict(_flagship_hp(tiny), use_spk_embed=True, hop_size=HOP,
                  audio_sample_rate=SR, seed=1234)

        def __init__(self):
            self.variables = variables
            self.vocoder = _Voc()
            self._predict_dur = jax.jit(
                lambda v, *a: model.apply(
                    v, *a, method=GaussianDiffusion.predict_durations))
            self._infer = jax.jit(
                lambda v, txt, tm, m2p, spk, mels, f0, uv, rng: model.apply(
                    v, txt, tm, m2p, spk, mels, f0, uv, infer=True,
                    use_pred_pitch=True, rng=rng))

        def spk_embedder(self, wav):
            return np.zeros(256, np.float32)

        def preprocess_input(self, inp):
            return inp["item"]

    return _BenchInfer(), model, voc, variables, vparams


def _draw_traffic(args, rate=None):
    """(lognormal frame lengths, Poisson arrival times). Lengths clip to
    the largest configured bucket so rare >17 s draws don't force one-off
    overflow-bucket compiles mid-traffic."""
    rate = args.rate if rate is None else rate
    rs = np.random.RandomState(args.seed)
    n = (args.n_requests if not args.duration
         else max(8, int(rate * args.duration)))
    dur = np.exp(rs.normal(np.log(5.5), 0.45, n))
    t_max = max(int(x) for x in args.buckets.split(","))
    frames = np.clip((dur * SR / HOP).astype(int), 90, t_max)
    t_arr = np.cumsum(rs.exponential(1.0 / rate, n))
    return frames, t_arr


def _latency_summary(lat):
    lat = np.asarray(lat) * 1e3
    return {"p50": round(float(np.percentile(lat, 50)), 1),
            "p90": round(float(np.percentile(lat, 90)), 1),
            "p99": round(float(np.percentile(lat, 99)), 1),
            "max": round(float(lat.max()), 1),
            "mean": round(float(lat.mean()), 1)}


def run_online_real(args):
    """REAL OnlineEditServer under Poisson arrivals on the chip."""
    import time as _time

    from speech_editing_tpu.infer.online import OnlineEditServer
    from speech_editing_tpu.infer.serving import BatchedEditServer

    infer, *_ = build_infer_adapter(args.tiny)
    if args.fast_io:
        # device-side int16 PCM + no mel fetch: the tunnel-bandwidth
        # levers (serving.py _init_config docs); A/B'd vs default in
        # BASELINE.md's online serving rows
        infer.hp = dict(infer.hp, serve_wav_int16=True,
                        serve_fetch_mel="off")
    buckets = tuple(int(x) for x in args.buckets.split(","))
    server = BatchedEditServer(
        infer, max_batch=args.max_batch, frame_buckets=buckets,
        token_buckets=(32, 64, 128, 256),
        frames_batch_budget=args.frames_batch_budget,
        adaptive_tail=args.adaptive_tail,
        merge_token_tails=args.merge_token_tails)

    # --multi-rate: sweep the offered loads in args.rates inside ONE
    # warmed process (warmup at flagship sizes is ~6 min of trace +
    # cache-deserialize per process — paying it once per rate would
    # triple the bench wall time for no measurement benefit)
    rates = ([float(x) for x in args.rates.split(",")]
             if args.multi_rate else [args.rate])
    traffic = {}
    for rate in rates:
        frames, t_arr = _draw_traffic(args, rate)
        rs = np.random.RandomState(1)
        traffic[rate] = ([{"item": synth_online_item(rs, f, f"r{i}")}
                          for i, f in enumerate(frames)], t_arr)

    # warm exactly the (token, frame) pairs this traffic hits, plus the
    # neighbouring frame buckets (stage-2 lands at fb(t_new), which can
    # cross a boundary either way when the edit changes the length)
    pairs = set()
    for reqs, _ in traffic.values():
        for r in reqs:
            it = r["item"]
            s_b = server._tb(len(it["edited_ph_token"]))
            t_b = server._fb(len(it["mel2ph"]))
            pairs.add((s_b, t_b))
            nxt = [b for b in server.frame_buckets if b > t_b]
            prv = [b for b in server.frame_buckets if b < t_b]
            if nxt:
                pairs.add((s_b, nxt[0]))
            if prv:
                pairs.add((s_b, prv[-1]))
    t0 = _time.perf_counter()
    print(f"| warmup pairs: {sorted(pairs)}", file=sys.stderr, flush=True)
    server.warmup(pairs=sorted(pairs), verbose=True,
                  workers=args.warmup_workers)
    warmup_s = _time.perf_counter() - t0
    shapes_warm = set(server.program_shapes)

    for rate in rates:
        reqs, t_arr = traffic[rate]
        srv = OnlineEditServer(server, max_wait_ms=args.max_wait_ms,
                               workers=args.workers)
        t_start = _time.monotonic()
        futures = []
        for i, req in enumerate(reqs):
            lag = t_start + t_arr[i] - _time.monotonic()
            if lag > 0:
                _time.sleep(lag)
            futures.append(srv.submit(req))
        results = [f.result(timeout=1800) for f in futures]
        t_done = _time.monotonic()
        srv.close()

        lat = [f.latency_s for f in futures]
        new_shapes = server.program_shapes - shapes_warm
        n_real = sum(l[3] for l in srv.launches)
        fill = n_real / max(sum(l[4] for l in srv.launches), 1)
        n_merged = sum(l[5] for l in srv.launches)
        audio_s = float(sum(r["t_frames"] for r in results) * HOP / SR)
        wall = t_done - t_start
        print(json.dumps({
            "metric": "serving_online_edits_per_sec_per_chip",
            "value": round(len(results) / wall, 2),
            "unit": (f"edits/s REAL Poisson load rate={rate}/s "
                     f"({len(results)} reqs, max_wait={args.max_wait_ms}ms, "
                     f"queue-inclusive wall latency incl. tunnel RTT)"),
            "offered_rate": rate,
            "latency_ms": _latency_summary(lat),
            "audio_sec_per_sec": round(audio_s / wall, 1),
            "chunk_fill": round(fill, 3),
            "n_chunks": len(srv.launches),
            "n_merged_requests": n_merged,
            "warmup_s": round(warmup_s, 1),
            "compiles_after_warmup": len(new_shapes),
            "adaptive_tail": bool(args.adaptive_tail),
            "merge_token_tails": bool(args.merge_token_tails),
            "workers": args.workers, "fast_io": bool(args.fast_io),
        }), flush=True)


def make_model_k(model):
    """K-scan of the serving _infer program alone (no vocoder)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(9,))
    def model_k(params, txt, mask, mel2ph, spk, ref, f0, uv, rng, k):
        def body(acc, key):
            r = ref + jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
            out = model.apply(params, txt, mask, mel2ph, spk, r, f0, uv,
                              infer=True, use_pred_pitch=True, rng=key)
            return acc + out["mel_out"].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros(ref.shape, jnp.float32),
                              jax.random.split(rng, k))
        return acc

    return model_k


def make_voc_k(voc):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(3,))
    def voc_k(vps, mel, rng, k):
        def body(acc, key):
            m = mel + jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
            return acc + voc.apply(vps, m).astype(jnp.float32), None

        b, t = mel.shape[0], mel.shape[1]
        acc, _ = jax.lax.scan(body, jnp.zeros((b, t * HOP), jnp.float32),
                              jax.random.split(rng, k))
        return acc

    return voc_k


def make_dur_k(model):
    import jax
    import jax.numpy as jnp

    from speech_editing_tpu.models.spec_denoiser.spec_denoiser import \
        GaussianDiffusion

    @partial(jax.jit, static_argnums=(6,))
    def dur_k(params, txt, tm, m2p, mdur, spk, k):
        def body(acc, key):
            s = spk + jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
            out = model.apply(params, txt, tm, m2p, mdur, s,
                              method=GaussianDiffusion.predict_durations)
            return acc + out["dur"].astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((txt.shape[0], txt.shape[1]), jnp.float32),
            jax.random.split(jax.random.PRNGKey(5), k))
        return acc

    return dur_k


def _two_k_delta(fn_call, k1, k2):
    """Warm per-iteration seconds via the two-K scan-delta protocol."""
    def timed(k):
        np.asarray(fn_call(k))  # compile / warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn_call(k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    w1, w2 = timed(k1), timed(k2)
    return max(w2 - w1, 1e-9) / (k2 - k1)


def run_online_virtual(args):
    """Latency-throughput curve: the REAL scheduler under a virtual clock
    whose chunk service times are measured on-chip (two-K scan protocol,
    tunnel-free)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from speech_editing_tpu.infer.online import OnlineEditServer
    from speech_editing_tpu.infer.serving import (BatchedInPlaceEditServer,
                                                  Request)

    buckets = tuple(int(x) for x in args.buckets.split(","))
    cfg = BatchedInPlaceEditServer(
        SimpleNamespace(hp={"frames_multiple": 1}), max_batch=args.max_batch,
        frame_buckets=buckets, token_buckets=(32, 64, 128, 256),
        frames_batch_budget=args.frames_batch_budget,
        adaptive_tail=False,  # pow2-ladder times not measured
        merge_token_tails=args.merge_token_tails)

    rates = [float(x) for x in args.rates.split(",")]
    # per-rate traffic shares the same length distribution
    rs_len = np.random.RandomState(args.seed)
    frames_all = np.clip((np.exp(rs_len.normal(np.log(5.5), 0.45, 4096))
                          * SR / HOP).astype(int), 90, max(buckets))

    # measure service times for every (t_b, mb) the traffic can hit
    t_bs = sorted({cfg._fb(int(f)) for f in frames_all})
    svc_dur, svc_diff = {}, {}
    dropped = []
    if args.fake_service_ms > 0:
        # pure-scheduler validation mode: skip hardware measurement and
        # charge every chunk a fixed cost (NEVER a reported number)
        for t_b in t_bs:
            mb = cfg._mb(t_b)
            svc_diff[(t_b, mb)] = args.fake_service_ms / 1e3 * t_b / 512
            svc_dur[(t_b, mb)] = args.fake_service_ms / 2e4
    else:
        rs = np.random.RandomState(0)
        model, voc = build_programs(args.tiny)
        ins1 = batch_inputs(rs, 1, 128)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)}, *ins1)
        vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), ins1[4])
        model_k, voc_k, dur_k = (make_model_k(model), make_voc_k(voc),
                                 make_dur_k(model))
        rng = jax.random.PRNGKey(3)
        for t_b in t_bs:
            mb = cfg._mb(t_b)
            ins = batch_inputs(rs, mb, t_b)
            txt, mask, mel2ph, spk, ref, f0, uv = ins
            for attempt in (1, 2, 3):  # transient axon remote-compile RPCs
                print(f"| measuring T={t_b} B={mb} (attempt {attempt})",
                      file=sys.stderr, flush=True)
                try:
                    diff_s = _two_k_delta(
                        lambda k: model_k(variables, txt, mask, mel2ph, spk,
                                          ref, f0, uv,
                                          jax.random.fold_in(rng, t_b), k),
                        args.k1, args.k2)
                    voc_s = _two_k_delta(
                        lambda k: voc_k(vparams, ref, rng, k),
                        args.k1, args.k2)
                    mdur = jnp.asarray(np.ones((mb, S_TXT), np.int64))
                    dur_s = _two_k_delta(
                        lambda k: dur_k(variables, txt, mask, mel2ph, mdur,
                                        spk, k),
                        args.k1, args.k2)
                    svc_diff[(t_b, mb)] = diff_s + voc_s
                    svc_dur[(t_b, mb)] = dur_s
                    break
                except Exception as e:
                    print(f"| T={t_b} attempt {attempt} failed: "
                          f"{type(e).__name__}: {str(e)[:160]}",
                          file=sys.stderr, flush=True)
            else:
                dropped.append(t_b)
        if dropped:
            # no silent caps: drop that bucket's requests and SAY so
            print(f"| DROPPING buckets {dropped} after 3 failed attempts",
                  file=sys.stderr, flush=True)
            keep = np.asarray([cfg._fb(int(f)) not in dropped
                               for f in frames_all])
            frames_all = frames_all[keep]

    class _VClock:
        t = 0.0

    class SimPipeline:
        """Real scheduler, measured service times, t_new == t0."""
        STAGES = ("dur", "diff")
        adaptive_tail = cfg.adaptive_tail
        merge_token_tails = cfg.merge_token_tails

        def __init__(self, clk):
            self.clk = clk

        def _mb(self, t_b):
            return cfg._mb(t_b)

        def online_prepare(self, inp, seed):
            r = Request(inp)
            r.stage = "dur"
            s_edit = 2 * (max(4, inp["t"] // 24) + 1)
            r.group = (cfg._tb(s_edit), cfg._fb(inp["t"]))
            return r

        def online_run(self, stage, s_b, t_b, reqs, b_eff):
            svc = svc_dur if stage == "dur" else svc_diff
            self.clk.t += svc[(t_b, b_eff)]
            for r in reqs:
                if stage == "dur":
                    r.stage = "diff"  # group unchanged: t_new == t0
                else:
                    r.result = {"t_frames": t_b}

    def sim_rate(rate: float, merge: bool) -> dict:
        n = max(64, int(rate * args.duration)) if args.duration else \
            args.n_requests
        frames = frames_all[:n]
        t_arr = np.cumsum(
            np.random.RandomState(args.seed + 1).exponential(1.0 / rate, n))
        clk = _VClock()
        srv = OnlineEditServer(SimPipeline(clk),
                               max_wait_ms=args.max_wait_ms,
                               clock=lambda: clk.t, start=False,
                               merge_token_tails=merge)
        futs, i = [], 0
        while i < n or srv._n_queued:
            while i < n and t_arr[i] <= clk.t + 1e-12:
                futs.append(srv.submit({"t": int(frames[i])}))
                i += 1
            if srv.poll_once():
                continue
            nd = srv._next_deadline()
            cand = [x for x in (nd, t_arr[i] if i < n else None)
                    if x is not None]
            if not cand:
                break
            clk.t = max(clk.t, min(cand))
        lat = [f.latency_s for f in futs]
        n_real = sum(l[3] for l in srv.launches)
        fill = n_real / max(sum(l[4] for l in srv.launches), 1)
        busy = sum((svc_dur if l[0] == "dur" else svc_diff)[(l[2], l[4])]
                   for l in srv.launches)
        wall = clk.t
        return {
            "rate": rate, "n": n,
            "throughput": round(n / max(wall, 1e-9), 2),
            "latency_ms": _latency_summary(lat),
            "chunk_fill": round(fill, 3),
            "utilization": round(busy / max(wall, 1e-9), 3),
            "n_merged_requests": sum(l[5] for l in srv.launches),
        }

    # once service times are measured, sims are free — A/B the
    # cross-token-bucket packing lever from the SAME measurements
    curves = {}
    for merge in (True, False):
        key = "merge_on" if merge else "merge_off"
        curves[key] = [sim_rate(r, merge) for r in rates]
        for row in curves[key]:
            print(f"| {key} rate={row['rate']}: {row}", file=sys.stderr,
                  flush=True)
    main_curve = curves["merge_on"]

    print(json.dumps({
        "metric": "serving_online_latency_curve",
        "value": main_curve[-1]["latency_ms"]["p99"],
        "unit": (f"p99 ms at rate={rates[-1]}/s, merge on (virtual clock "
                 f"over on-chip two-K service times, max_wait="
                 f"{args.max_wait_ms}ms)"),
        "curves": curves,
        "dropped_buckets": dropped,
        "service_times_ms": {
            f"T{t}xB{b}": {"dur": round(svc_dur[(t, b)] * 1e3, 2),
                           "diff+voc": round(svc_diff[(t, b)] * 1e3, 2)}
            for (t, b) in sorted(svc_diff)},
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
    ap.add_argument("--online", action="store_true",
                    help="OnlineEditServer under Poisson arrivals")
    ap.add_argument("--virtual", action="store_true",
                    help="virtual clock + measured service times (curve)")
    ap.add_argument("--rate", type=float, default=40.0,
                    help="offered load, edits/s (real online mode)")
    ap.add_argument("--rates", default="35,56,67",
                    help="offered loads for --virtual curve")
    ap.add_argument("--duration", type=float, default=0.0,
                    help="traffic duration seconds (0: use --n-requests)")
    ap.add_argument("--max-wait-ms", dest="max_wait_ms", type=float,
                    default=100.0)
    ap.add_argument("--merge-token-tails", dest="merge_token_tails",
                    action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help="scheduler threads (2 overlaps fetch with the "
                         "next dispatch — hides the tunnel RTT)")
    ap.add_argument("--fast-io", dest="fast_io", action="store_true",
                    help="--online real mode: serve_wav_int16 + "
                         "serve_fetch_mel=off (tunnel-bandwidth levers)")
    ap.add_argument("--multi-rate", dest="multi_rate", action="store_true",
                    help="--online real mode: sweep --rates offered loads "
                         "in one warmed process (one JSON line per rate)")
    ap.add_argument("--warmup-workers", dest="warmup_workers", type=int,
                    default=1, help="concurrent warmup shapes (overlaps "
                                    "host tracing with remote compiles)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend at config level (the env "
                         "var is overridden by the axon plugin)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model CPU smoke test (never a reported number)")
    ap.add_argument("--fake-service-ms", dest="fake_service_ms", type=float,
                    default=0.0,
                    help="--virtual only: fixed fake chunk cost, validates "
                         "the sim event loop without hardware (never a "
                         "reported number)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # config-level forcing: the axon plugin overrides the
        # JAX_PLATFORMS env var, so only this works (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.online and args.virtual:
        run_online_virtual(args)
    elif args.online:
        run_online_real(args)
    elif args.mixed:
        run_mixed(args)
    else:
        run_uniform(args)


if __name__ == "__main__":
    main()
