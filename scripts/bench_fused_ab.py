"""In-process A/B of the fused Pallas DiffNet block vs the XLA path.

Process-level A/B (two bench_train.py runs) is unusable on the axon tunnel:
step-time noise across processes is +-30% with serial correlation. This
script builds BOTH train steps (hp flag fused_diffnet True/False -> DiffNet
allow_fused) in ONE process and interleaves the two-K scan-delta
measurements round-robin (A,B,A,B,...), so slow drift hits both variants
equally. Prints per-round ms/step pairs and the median delta.

Usage: python scripts/bench_fused_ab.py [--bf16] [--frames T] [--batch B]
       [--rounds N]
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
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    os.environ["SET_FUSED_DIFFNET"] = "1"  # gate fully open; allow_fused decides
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

    vocab = 80
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    batch = _example_batch(b=args.batch, t=args.frames, s=args.tokens,
                           vocab=vocab)
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(7)
    k1, k2 = 4, 4 + args.iters

    def build_variant(fused: bool):
        hp = _flagship_hp()
        hp["use_bf16"] = bool(args.bf16)
        hp["fused_diffnet"] = fused
        model = build_model(vocab, hp)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)},
            jnp.asarray(batch["txt_tokens"]),
            jnp.asarray(batch["time_mel_masks"])[..., None],
            jnp.asarray(batch["mel2ph"]), None, jnp.asarray(batch["mels"]),
            jnp.asarray(batch["f0"]), jnp.asarray(batch["uv"]))
        tx = build_optimizer(hp)
        state = TrainState.create(variables["params"], tx)
        loss_fn = make_loss_fn(model, hp, sil_token_ids=(3,))
        raw_step = make_train_step(loss_fn, tx, mesh=mesh,
                                   use_bf16=bool(hp.get("use_bf16", False)),
                                   jit=False)

        @partial(jax.jit, static_argnums=3)
        def run_k(state, batch, rng, k):
            def body(st, key):
                st, m = raw_step(st, batch, key)
                return st, m["total_loss"]
            return jax.lax.scan(body, state, jax.random.split(rng, k))

        return state, run_k

    def fetch(st):
        leaf = max(jax.tree.leaves(st.params), key=lambda x: x.size)
        return np.asarray(leaf)

    variants = {"xla": build_variant(False), "fused": build_variant(True)}

    # compile + warm every (variant, k) program before any timing
    for name, (st, run_k) in variants.items():
        for k in (k1, k2):
            s2, _ = run_k(st, sharded, rng, k)
            fetch(s2)

    def one_time(st, run_k, k, r):
        t0 = time.perf_counter()
        s2, losses = run_k(st, sharded, r, k)
        fetch(s2)
        return time.perf_counter() - t0, float(np.asarray(losses)[-1])

    results = {n: [] for n in variants}
    loss = {}
    for rnd in range(args.rounds):
        r = jax.random.fold_in(rng, rnd)
        for name, (st, run_k) in variants.items():
            t1, _ = one_time(st, run_k, k1, r)
            t2, loss[name] = one_time(st, run_k, k2, r)
            ms = (t2 - t1) / (k2 - k1) * 1e3
            results[name].append(ms)
        print(f"round {rnd}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}ms" for n in variants), flush=True)

    med = {n: float(np.median(v)) for n, v in results.items()}
    print(json.dumps({
        "metric": "fused_diffnet_ab_ms_per_step",
        "shape": f"B={args.batch} T={args.frames}"
                 f"{' bf16' if args.bf16 else ' fp32'}",
        "xla_ms": round(med["xla"], 2),
        "fused_ms": round(med["fused"], 2),
        "speedup": round(med["xla"] / med["fused"], 4),
        "rounds": {n: [round(x, 1) for x in v] for n, v in results.items()},
        "loss": {n: round(v, 4) for n, v in loss.items()},
    }))


if __name__ == "__main__":
    main()
