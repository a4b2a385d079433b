"""Adaptive-tail drift bound at flagship sizes (VERDICT r4 stretch #7).

The adaptive-tail contract claims a tail-chunk request matches the
fixed-batch result up to recompile reassociation (~1e-6); the regression
test asserts atol 2e-5 on a TINY model. This A/B measures the bound at
FLAGSHIP sizes on the chip: the same synthetic request batch is served
through the full pipeline twice — fixed batch (replicate-padded to mb)
vs adaptive tail (pow2 program) — and reports the max-abs mel delta per
frame bucket. 20 DiffNet layers x 8 diffusion steps is the worst
realistic amplification path for reassociation drift.

Usage: python scripts/adaptive_drift_ab.py [--frames 512,1024]
       [--max-batch 16] [--tail 3] [--tiny]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_serving import build_infer_adapter, synth_online_item  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default="512,1024")
    ap.add_argument("--max-batch", dest="max_batch", type=int, default=16)
    ap.add_argument("--tail", type=int, default=3,
                    help="tail size (pow2ceil(tail) != max_batch required)")
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

    from speech_editing_tpu.infer.serving import BatchedEditServer, _pow2ceil
    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    assert _pow2ceil(args.tail) != args.max_batch, \
        "tail pow2 equals max_batch: both variants would run one program"
    infer, *_ = build_infer_adapter(args.tiny)
    frames_list = [int(x) for x in args.frames.split(",")]
    rs = np.random.RandomState(3)

    per_bucket = {}
    worst = 0.0
    for t0 in frames_list:
        reqs = [{"item": synth_online_item(rs, t0 - 8, f"d{t0}_{i}")}
                for i in range(args.tail)]
        buckets = (t0, 2 * t0)

        def serve(adaptive):
            srv = BatchedEditServer(
                infer, max_batch=args.max_batch, frame_buckets=buckets,
                token_buckets=(32, 64, 128, 256),
                adaptive_tail=adaptive)
            return srv.edit_many([dict(r) for r in reqs], seed=7)

        res_f = serve(False)
        res_a = serve(True)
        deltas = []
        for f, a in zip(res_f, res_a):
            assert a["t_frames"] == f["t_frames"]
            deltas.append(float(np.abs(a["mel_out"] - f["mel_out"]).max()))
        per_bucket[f"T{t0}"] = {
            "max_abs_mel_delta": max(deltas),
            "batches": f"fixed B={args.max_batch} vs adaptive "
                       f"B={_pow2ceil(args.tail)}"}
        worst = max(worst, max(deltas))
        print(f"| T~{t0}: max|d| {max(deltas):.3e}", file=sys.stderr,
              flush=True)

    print(json.dumps({
        "metric": "adaptive_tail_mel_drift_max_abs",
        "value": worst,
        "unit": (f"max-abs mel delta, fixed-batch vs adaptive-tail "
                 f"(flagship diffusion T=8, {args.tail}-request tails, "
                 f"buckets {frames_list})"),
        "per_bucket": per_bucket,
    }))


if __name__ == "__main__":
    main()
