"""Per-component train-step cost breakdown on the flagship model.

Times three jitted fwd+bwd programs at the bench shapes (B=80, T=512,
bf16 by default) with the same honest protocol as bench_train.py
(K-iteration in-program scan, large-output fetch barrier, two-K
differencing):

  * full     — the complete loss (conditioner + denoiser + mel/dur/pitch)
  * diffnet  — DiffNet denoiser alone (random x_t/t/cond, L1 to target)
  * cond     — FastSpeech conditioner + MelEncoder path alone

The full-vs-sum gap is the loss/elementwise tail. Used to decide where
Pallas kernel effort goes (VERDICT round-1 item #7).
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


def cost_of(loss, params, args):
    """XLA cost analysis (flops, bytes accessed) of one fwd+bwd call."""
    import jax

    grad_fn = jax.jit(jax.grad(loss))
    c = grad_fn.lower(params, *args, jax.random.PRNGKey(0)).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per computation
        ca = ca[0]
    return {"tflop": round(ca.get("flops", 0) / 1e12, 3),
            "gb": round(ca.get("bytes accessed", 0) / 1e9, 2)}


def timed_grad_program(loss, params, args, iters: int):
    """Time fwd+bwd of ``loss(params, *args, key)`` via scan differencing."""
    import jax
    import jax.numpy as jnp

    grad_fn = jax.grad(loss)

    @partial(jax.jit, static_argnums=2)
    def run_k(params, args, k, rng):
        def body(p, key):
            g = grad_fn(p, *args, key)
            # consume the grads so no step is dead code; keep params live
            return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), ()
        p, _ = jax.lax.scan(body, params, jax.random.split(rng, k))
        return p

    def fetch(p):
        leaf = max(jax.tree.leaves(p), key=lambda x: x.size)
        return np.asarray(leaf)

    def run(k):
        rng = jax.random.PRNGKey(3)
        p = run_k(params, args, k, rng)   # compile + warm
        fetch(p)
        ts = []
        for s in (5, 7):
            t0 = time.perf_counter()
            p = run_k(params, args, k, jax.random.PRNGKey(s))
            fetch(p)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k1, k2 = 4, 4 + iters
    return max(run(k2) - run(k1), 1e-9) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=96)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default="", help="comma list: full,diffnet,cond")
    ap.add_argument("--cost", action="store_true",
                    help="also print XLA cost analysis per component")
    args = ap.parse_args()

    import jax

    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_hp
    from speech_editing_tpu.training.tasks.spec_denoiser import (build_model,
                                                                 make_loss_fn)

    hp = _flagship_hp()
    hp["use_bf16"] = not args.fp32
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    vocab = 80
    model = build_model(vocab, hp)
    batch = _example_batch(b=args.batch, t=args.frames, s=args.tokens,
                           vocab=vocab)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    tm = jb["time_mel_masks"][..., None]

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jb["txt_tokens"], tm, jb["mel2ph"], None, jb["mels"], jb["f0"],
        jb["uv"])
    params = variables["params"]
    if not args.fp32:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    results = {}
    costs = {}
    wanted = set(args.only.split(",")) if args.only else {"full", "diffnet",
                                                          "cond"}

    if "full" in wanted:
        loss_fn = make_loss_fn(model, hp, sil_token_ids=(3,))
        cast = {k: (v.astype(dtype) if v.dtype == jnp.float32 else v)
                for k, v in jb.items()}

        def full_loss(p, _unused, key):
            return loss_fn(p, cast, key)[0]

        results["full"] = timed_grad_program(full_loss, params,
                                             (jnp.zeros(()),), args.iters)
        if args.cost:
            costs["full"] = cost_of(full_loss, params, (jnp.zeros(()),))

    if "diffnet" in wanted:
        c = hp["residual_channels"]
        h = hp["hidden_size"]
        rs = np.random.RandomState(0)
        x_t = jnp.asarray(rs.randn(args.batch, args.frames, 80), dtype)
        cond = jnp.asarray(rs.randn(args.batch, args.frames, h), dtype)
        target = jnp.asarray(rs.randn(args.batch, args.frames, 80), dtype)

        def diffnet_loss(p, x_t, cond, target, key):
            t = jax.random.randint(key, (args.batch,), 0, hp["timesteps"])
            x0 = model.apply({"params": p}, x_t, t, cond,
                             method=model.denoise)
            return jnp.mean(jnp.abs(x0 - target))

        results["diffnet"] = timed_grad_program(
            diffnet_loss, params, (x_t, cond, target), args.iters)
        if args.cost:
            costs["diffnet"] = cost_of(diffnet_loss, params,
                                       (x_t, cond, target))

    if "cond" in wanted:
        def cond_loss(p, key):
            ret = model.apply({"params": p}, jb["txt_tokens"],
                              tm.astype(dtype), jb["mel2ph"], None,
                              jb["mels"].astype(dtype),
                              jb["f0"].astype(dtype), jb["uv"].astype(dtype),
                              method=model.compute_cond,
                              rngs={"dropout": key})
            return (jnp.mean(jnp.abs(ret["cond"]))
                    + jnp.mean(jnp.abs(ret["dur"]))
                    + jnp.mean(jnp.abs(ret["pitch_pred"])))

        def cond_wrap(p, _unused, key):
            return cond_loss(p, key)

        results["cond"] = timed_grad_program(cond_wrap, params,
                                             (jnp.zeros(()),), args.iters)
        if args.cost:
            costs["cond"] = cost_of(cond_wrap, params, (jnp.zeros(()),))

    print(json.dumps({
        "shapes": {"batch": args.batch, "frames": args.frames,
                   "bf16": not args.fp32},
        "flash_attention": os.environ.get("SET_FLASH_ATTENTION", "auto"),
        "ms_per_step": {k: round(v * 1e3, 2) for k, v in results.items()},
        "cost_analysis": costs,
    }))


if __name__ == "__main__":
    main()
