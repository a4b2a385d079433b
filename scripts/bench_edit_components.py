"""Per-component cost breakdown of the end-to-end edit program (inference).

bench.py's RTF covers mel+f0 front-end -> conditioner -> 8-step reverse
diffusion -> HiFi-GAN. This script times each stage separately at the bench
shapes (B=1, T=512) with the same honest protocol (K-iteration in-program
scan with per-iteration input perturbation, full-output accumulation,
device->host fetch barrier, two-K differencing) so kernel effort goes where
the milliseconds are. Prints one JSON line of ms-per-call per stage.
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


def timed_program(fn, args, iters=40, k1=4):
    """ms per call of ``fn(key, *args) -> array`` via scan differencing."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=2)
    def run_k(args, rng, k):
        def body(acc, key):
            out = fn(key, *args)
            return acc + out.astype(jnp.float32), None
        probe = jax.eval_shape(fn, jax.random.PRNGKey(0), *args)
        acc, _ = jax.lax.scan(body, jnp.zeros(probe.shape, jnp.float32),
                              jax.random.split(rng, k))
        return acc

    def run(k):
        np.asarray(run_k(args, jax.random.PRNGKey(3), k))  # compile + warm
        ts = []
        for s in (5, 7, 9):
            t0 = time.perf_counter()
            np.asarray(run_k(args, jax.random.PRNGKey(s), k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k2 = k1 + iters
    return max(run(k2) - run(k1), 1e-9) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--only", default="",
                    help="comma list: mel,f0,cond,diffusion,vocoder,full")
    ap.add_argument("--bf16", action="store_true",
                    help="cast vocoder/diffusion params + activations to bf16")
    ap.add_argument("--cost", action="store_true",
                    help="print XLA cost analysis (flops/bytes) per stage")
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from speech_editing_tpu.models.vocoder import HifiGanGenerator
    from speech_editing_tpu.ops import diffusion as diff_ops
    from speech_editing_tpu.ops.mel import MelConfig
    from speech_editing_tpu.ops.pallas.mel_kernel import \
        mel_spectrogram_pallas as mel_spectrogram
    from speech_editing_tpu.ops.pitch import (extract_pitch_jax,
                                              norm_interp_f0_jax)
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model

    # parse --only FIRST: unjitted flax init dispatches op-by-op (minutes on
    # a 1-CPU host), so cheap single-stage runs must not pay model/vocoder
    # setup they don't use
    all_stages = ("mel", "f0", "cond", "diffusion", "vocoder", "full")
    wanted = set(args.only.split(",")) if args.only else set(all_stages)
    need_model = bool(wanted & {"cond", "diffusion", "full"})
    need_voc = bool(wanted & {"vocoder", "full"})

    sr, hop = 22050, 256
    T = args.frames
    n_wav = T * hop
    rs = np.random.RandomState(0)
    t_ax = np.arange(n_wav) / sr
    wav = (0.3 * np.sin(2 * np.pi * 180 * t_ax)
           * (1 + 0.3 * np.sin(2 * np.pi * 3 * t_ax))).astype(np.float32)
    wav_j = jnp.asarray(wav[None])

    cfg = MelConfig()
    hp = _flagship_hp()
    vocab, s_txt = 80, 48
    model = build_model(vocab, hp)
    txt = jnp.asarray(rs.randint(1, vocab, (1, s_txt)), jnp.int32)
    mel2ph = jnp.asarray(
        np.clip(np.sort(rs.randint(1, s_txt + 1, (1, T))), 1, s_txt), jnp.int32)
    mask = np.zeros((1, T, 1), np.float32)
    mask[:, T // 3: 2 * T // 3] = 1.0
    mask = jnp.asarray(mask)
    f0 = jnp.asarray(rs.rand(1, T), jnp.float32)
    uv = jnp.zeros((1, T), jnp.float32)

    vhp = {"upsample_rates": [8, 8, 2, 2],
           "upsample_kernel_sizes": [16, 16, 4, 4],
           "upsample_initial_channel": 512, "resblock": "1",
           "resblock_kernel_sizes": [3, 7, 11],
           "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]]}
    voc = HifiGanGenerator(hp=vhp)

    mel0 = mel_spectrogram(wav_j, cfg)[:, :T]
    variables = vparams = None
    if need_model:
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)},
            txt, mask, mel2ph, None, mel0, f0, uv)
    if need_voc:
        vparams = jax.jit(voc.init)(jax.random.PRNGKey(2), mel0)
    if args.bf16:
        if vparams is not None:
            vparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vparams)
        if variables is not None:
            variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                                     if x.dtype == jnp.float32 else x,
                                     variables)
        mel0 = mel0.astype(jnp.bfloat16)
    sched = diff_ops.DiffusionSchedule.create(
        schedule_type=hp.get("schedule_type", "vpsde"),
        timesteps=hp["timesteps"], time_scale=hp.get("timescale", 1))

    def perturb(key, x):
        return x + jax.random.uniform(key, (), minval=0.0, maxval=1e-7)

    stages = {}

    def mel_fn(key, wav_in):
        return mel_spectrogram(perturb(key, wav_in), cfg)[:, :T]

    def f0_fn(key, wav_in):
        f0_hz = extract_pitch_jax(perturb(key, wav_in)[0], hop, sr,
                                  80.0, 600.0)[:T]
        f0n, uvn = norm_interp_f0_jax(f0_hz)
        return f0n[None] + uvn[None]

    def cond_fn(key, params, txt, mask, mel2ph, mel, f0, uv):
        ret = model.apply(params, txt, mask, mel2ph, None,
                          perturb(key, mel), f0, uv,
                          method=model.compute_cond, use_pred_pitch=True)
        return ret["cond"]

    cond0 = None
    if "diffusion" in wanted:  # only diffusion_fn consumes cond0
        cond0 = jax.jit(cond_fn)(jax.random.PRNGKey(0), variables, txt, mask,
                                 mel2ph, mel0, f0, uv)

    def diffusion_fn(key, params, cond):
        b = cond.shape[0]
        x = jax.random.normal(key, (b, cond.shape[1], 80), cond.dtype)
        for i in range(sched.num_timesteps - 1, -1, -1):
            t = jnp.full((b,), i, jnp.int32)
            key, sub = jax.random.split(key)
            x0_pred = model.apply(params, x, t, cond, method=model.denoise)
            x = diff_ops.q_posterior_sample(sched, x0_pred, x, t, sub)
        return x

    def vocoder_fn(key, vps, mel):
        return voc.apply(vps, perturb(key, mel))

    def full_fn(key, params, vps, wav_in, txt, mask, mel2ph):
        # the perturbed wav feeds BOTH the mel and f0 paths: with the raw
        # wav_in, the f0 extraction is loop-invariant and XLA hoists it out
        # of the timing scan, silently excluding its cost from "full"
        pw = perturb(key, wav_in)
        mel = mel_spectrogram(pw, cfg)[:, :T]
        f0_hz = extract_pitch_jax(pw[0], hop, sr, 80.0, 600.0)[:T]
        f0n, uvn = norm_interp_f0_jax(f0_hz)
        out = model.apply(params, txt, mask, mel2ph, None, mel,
                          f0n[None], uvn[None], infer=True, rng=key)
        comp = out["mel_out"] * mask + mel * (1 - mask)
        return voc.apply(vps, comp)

    table = {
        "mel": (mel_fn, (wav_j,)),
        "f0": (f0_fn, (wav_j,)),
        "cond": (cond_fn, (variables, txt, mask, mel2ph, mel0, f0, uv)),
        "diffusion": (diffusion_fn, (variables, cond0)),
        "vocoder": (vocoder_fn, (vparams, mel0)),
        "full": (full_fn, (variables, vparams, wav_j, txt, mask, mel2ph)),
    }
    costs = {}
    for name, (fn, a) in table.items():
        if name not in wanted:
            continue
        stages[name] = round(timed_program(fn, a, iters=args.iters), 3)
        if args.cost:
            c = jax.jit(fn).lower(jax.random.PRNGKey(0), *a).compile()
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            costs[name] = {"gflop": round(ca.get("flops", 0) / 1e9, 2),
                           "gb": round(ca.get("bytes accessed", 0) / 1e9, 3)}

    print(json.dumps({
        "shapes": {"frames": T, "batch": 1, "bf16": args.bf16},
        "ms_per_call": stages,
        "cost_analysis": costs,
        "audio_s": round(n_wav / sr, 3),
    }))


if __name__ == "__main__":
    main()
