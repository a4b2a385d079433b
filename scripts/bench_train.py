"""Training-throughput benchmark: mel frames/sec/chip on the flagship model.

Complements bench.py (inference edit RTF) with the second BASELINE.json
metric: sustained sharded train-step throughput of FluentSpeech
spec_denoiser at the real egs/spec_denoiser.yaml sizes. The batch mirrors
the reference's token budget (max_tokens=40000 mel frames per device
batch, egs/spec_denoiser.yaml) — here B x T = 40960 frames per step.

Usage: python scripts/bench_train.py [--bf16] [--batch B] [--frames T]
Prints one JSON line {"metric": "train_frames_per_sec_per_chip", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize DiffNet blocks in the bwd pass")
    ap.add_argument("--remat-fft", action="store_true",
                    help="rematerialize FFT-stack layers in the bwd pass")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--cost", action="store_true",
                    help="print XLA cost analysis (flops/bytes) + compiled "
                         "memory analysis (peak temp allocation) for ONE "
                         "train step at this shape")
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_hp
    from speech_editing_tpu.parallel.mesh import make_mesh, shard_batch
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.tasks.spec_denoiser import (build_model,
                                                                 make_loss_fn)
    from speech_editing_tpu.training.train_state import (TrainState,
                                                         make_train_step)

    hp = _flagship_hp()
    if args.bf16:
        hp["use_bf16"] = True
    if args.remat:
        hp["remat_diffnet"] = True
    if args.remat_fft:
        hp["remat_fft"] = True
    vocab = 80
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    model = build_model(vocab, hp)
    batch = _example_batch(b=args.batch, t=args.frames, s=args.tokens,
                           vocab=vocab)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.asarray(batch["txt_tokens"]),
        jnp.asarray(batch["time_mel_masks"])[..., None],
        jnp.asarray(batch["mel2ph"]), None, jnp.asarray(batch["mels"]),
        jnp.asarray(batch["f0"]), jnp.asarray(batch["uv"]))
    tx = build_optimizer(hp)
    state = TrainState.create(variables["params"], tx)
    loss_fn = make_loss_fn(model, hp, sil_token_ids=(3,))
    sharded = shard_batch(batch, mesh)

    # Measure K steps INSIDE one XLA program and difference two K values:
    # per-call wall time on remote backends (axon tunnel) carries a large,
    # sometimes optimistically-resolved round-trip component, so per-call
    # medians are not trustworthy; a scan of K dependent steps executes
    # sequentially on-device and the K2-K1 delta cancels all call overhead.
    from functools import partial

    raw_step = make_train_step(loss_fn, tx, mesh=mesh,
                               use_bf16=bool(hp.get("use_bf16", False)),
                               jit=False)

    @partial(jax.jit, static_argnums=3, donate_argnums=(0,))
    def run_k(state, batch, rng, k):
        def body(st, key):
            st, m = raw_step(st, batch, key)
            return st, m["total_loss"]
        return jax.lax.scan(body, state, jax.random.split(rng, k))

    cost_info = {}
    if args.cost:
        one_step = jax.jit(raw_step, donate_argnums=(0,))
        compiled = one_step.lower(state, sharded,
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
            cost_info["temp_hbm_gb"] = round(ma.temp_size_in_bytes / 1e9, 3)
        except Exception:
            pass
        del compiled, one_step

    k1, k2 = 4, 4 + args.iters
    rng = jax.random.PRNGKey(7)

    def fetch(st):
        # completion barrier: on the axon backend, waiting on a small
        # output can resolve before execution finishes — device->host
        # transfer of an updated param leaf (written by the LAST step of
        # the sequential scan) is the only reliable barrier
        leaf = max(jax.tree.leaves(st.params), key=lambda x: x.size)
        return np.asarray(leaf)

    def timed(k, st):
        rngs = jax.random.split(rng, 3)
        st, losses = run_k(st, sharded, rngs[0], k)  # compile + warm
        fetch(st)
        ts = []
        for r in rngs[1:]:
            t0 = time.perf_counter()
            st, losses = run_k(st, sharded, r, k)
            fetch(st)
            ts.append(time.perf_counter() - t0)
        return st, min(ts), losses

    state, t1, _ = timed(k1, state)
    state, t2, losses = timed(k2, state)
    step_s = max(t2 - t1, 1e-9) / (k2 - k1)
    frames = args.batch * args.frames
    fps_chip = frames / step_s / n_dev
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(fps_chip, 1),
        "unit": f"mel frames/s/chip (step={step_s*1e3:.1f}ms via "
                f"{k2}-{k1} in-program scan delta, batch={frames} frames, "
                f"{n_dev} devices{', bf16' if args.bf16 else ''}"
                f"{', remat' if args.remat else ''}"
                f"{', remat_fft' if args.remat_fft else ''})",
        "total_loss": round(float(losses[-1]), 4),
        **cost_info,
    }))


if __name__ == "__main__":
    main()
