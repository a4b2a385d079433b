"""HiFi-GAN GAN-step benchmark + roofline row (VERDICT r2 weak #2).

Times the fused generator+discriminator train step (the second-biggest
training workload) at the production crop config — B x 8192-sample crops,
full V1 generator, 5-period MPD + 3-scale MSD — with the same honest
protocol as bench_train.py (K steps inside one jitted lax.scan, large-
output fetch barrier, two-K differencing), and prints the XLA cost
analysis (TFLOP / bytes / peak temp HBM) so the step gets a roofline
position, not just an it/s figure.

NOTE: the full-size step's host-side XLA compile exceeds 10 minutes on
this 1-CPU host (CLAUDE.md); run detached the first time — the persistent
compile cache makes subsequent runs start in seconds.

Usage: python scripts/bench_vocoder_gan.py [--batch 8] [--samples 8192]
           [--bf16] [--iters 10] [--small]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="reduced discriminators (2 periods + 1 scale) for "
                         "smoke runs on slow-compile hosts")
    ap.add_argument("--cost", action="store_true")
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from speech_editing_tpu.parallel.mesh import make_mesh, shard_batch
    from speech_editing_tpu.training.tasks.hifigan import HifiGanTask

    hop = 256
    hp = {
        # full V1 generator (egs/hifigan.yaml surface)
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 512, "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "audio_sample_rate": 22050, "hop_size": hop, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 55, "fmax": 7600,
        "lr": 2e-4, "optimizer_adam_beta1": 0.8, "optimizer_adam_beta2": 0.99,
        "lambda_mel": 45.0, "lambda_adv": 1.0, "use_fm_loss": True,
        "use_ms_stft": False, "binary_data_dir": "", "vocab_size": 10,
        "generator_lr_decay": 0.999, "discriminator_lr_decay": 0.999,
    }

    rs = np.random.RandomState(0)
    t_mel = args.samples // hop
    batch = {
        "mels": (rs.randn(args.batch, t_mel, 80) * 0.5 - 2).astype(np.float32),
        "wavs": (0.5 * rs.randn(args.batch, args.samples)).astype(np.float32),
    }
    if args.bf16:
        batch = {k: v.astype(np.float32) for k, v in batch.items()}

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    task = HifiGanTask(hp)
    model = task.build_model()
    disc = task.build_discriminators()
    if args.small:
        from speech_editing_tpu.models.vocoder.hifigan import (
            MultiPeriodDiscriminator, MultiScaleDiscriminator)

        disc.mpd = MultiPeriodDiscriminator(periods=(2, 3))
        disc.msd = MultiScaleDiscriminator(num_scales=1)
    state = task.init_gan_state(model, disc, batch, jax.random.PRNGKey(0))
    raw_step = None

    # the task jits internally; rebuild the raw step for the scan
    step_fn = task.make_gan_train_step(model, disc, mesh=mesh)
    sharded = shard_batch(batch, mesh)

    cost_info = {}
    if args.cost:
        compiled = step_fn.lower(state, sharded,
                                 jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        cost_info = {"tflop_per_step": round(ca.get("flops", 0) / 1e12, 3),
                     "gb_accessed": round(
                         ca.get("bytes accessed", 0) / 1e9, 2)}
        try:
            ma = compiled.memory_analysis()
            cost_info["peak_hbm_gb"] = round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 1e9, 3)
        except Exception:
            pass

    # two-K in-program scan differencing (see bench_train.py rationale)
    @partial(jax.jit, static_argnums=3, donate_argnums=(0,))
    def run_k(state, batch, rng, k):
        def body(st, key):
            # step_fn is itself jitted; inside this trace it inlines
            st, m = step_fn(st, batch, key)
            return st, m["total_loss"]
        return jax.lax.scan(body, state, jax.random.split(rng, k))

    rng = jax.random.PRNGKey(7)

    def fetch(st):
        leaf = max(jax.tree.leaves(st.gen_params), key=lambda x: x.size)
        return np.asarray(leaf)

    def timed(k, st):
        rngs = jax.random.split(rng, 3)
        st, losses = run_k(st, sharded, rngs[0], k)
        fetch(st)
        ts = []
        for r in rngs[1:]:
            t0 = time.perf_counter()
            st, losses = run_k(st, sharded, r, k)
            fetch(st)
            ts.append(time.perf_counter() - t0)
        return st, min(ts), losses

    k1, k2 = 2, 2 + args.iters
    state, t1, _ = timed(k1, state)
    state, t2, losses = timed(k2, state)
    step_s = max(t2 - t1, 1e-9) / (k2 - k1)
    print(json.dumps({
        "metric": "hifigan_gan_steps_per_sec_per_chip",
        "value": round(1.0 / step_s / n_dev, 2),
        "unit": f"GAN steps/s/chip (step={step_s*1e3:.1f}ms, "
                f"B={args.batch}x{args.samples} samples, {n_dev} devices"
                f"{', small-disc' if args.small else ''})",
        "total_loss": round(float(losses[-1]), 4),
        **cost_info,
    }))


if __name__ == "__main__":
    main()
