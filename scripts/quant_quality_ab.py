"""Quantized-serving QUALITY A/B: acceptance metrics fp32 vs int8 weights.

Companion to ``scripts/bench_quant_serving.py`` (throughput): trains the
acceptance spec_denoiser on the structured synthetic corpus (same recipe
as ``scripts/e2e_acceptance.py`` — mel frames are a deterministic
function of the aligned phoneme), then regenerates each test item's
masked middle span twice with IDENTICAL per-item diffusion keys — once
with fp32 weights, once with weight-only int8 (infer/quant.py) — and
scores both against ground truth:

* masked-region mel MCD (``evals.mcd.get_metrics_mels`` over the span);
* STOI of Griffin-Lim wavs (GT mel vs composited mel, shared vocoder —
  the wav-domain acceptance protocol from PARITY_MEASURED.md).

The deliverable is the DELTA between the two columns: the quality cost
of int8 weight-only serving at trained weights (VERDICT r4 next#4).

Usage: python scripts/quant_quality_ab.py [--steps 4000] [--reuse-workdir]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--workdir", default="/tmp/quant_quality_ab")
    ap.add_argument("--reuse-workdir", action="store_true",
                    help="skip training if a checkpoint already exists")
    args = ap.parse_args()

    import yaml

    from e2e_acceptance import run_cli, write_structured_corpus
    from helpers import TINY_HP

    wd = args.workdir
    exp = "quant_ab_spec_denoiser"
    ckpt_dir = os.path.join(REPO, "checkpoints", exp)
    if not (args.reuse_workdir and glob.glob(
            os.path.join(ckpt_dir, "model_ckpt_steps_*.ckpt"))):
        shutil.rmtree(wd, ignore_errors=True)
        os.makedirs(wd, exist_ok=True)
        data_dir = os.path.join(wd, "binary")
        write_structured_corpus(data_dir)
        hp = dict(TINY_HP)
        hp.update({
            "task_cls": ("speech_editing_tpu.training.tasks."
                         "spec_denoiser.SpecDenoiserTask"),
            "binary_data_dir": data_dir,
            "max_updates": args.steps, "val_check_interval": args.steps,
            "max_tokens": 4000, "max_sentences": 8,
            "num_sanity_val_steps": 1, "num_ckpt_keep": 1,
            "tb_log_interval": 100, "seed": 0, "vocoder": "griffinlim",
            "training_mask_ratio": 0.6, "infer_mask_ratio": 0.5,
            "mask_type": "random", "hidden_size": 64,
            "residual_layers": 4, "residual_channels": 32,
            "timesteps": 8, "lr": 4e-4, "warmup_updates": 100,
        })
        cfg = os.path.join(wd, "cfg.yaml")
        yaml.safe_dump(hp, open(cfg, "w"))
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        run_cli(cfg, exp, "--reset")
    else:
        hp = yaml.safe_load(open(os.path.join(wd, "cfg.yaml")))

    import jax

    if os.environ.get("SE_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")  # plugin overrides env
    import jax.numpy as jnp

    from speech_editing_tpu.data.indexed_dataset import IndexedDataset
    from speech_editing_tpu.evals.mcd import get_metrics_mels
    from speech_editing_tpu.evals.stoi import stoi
    from speech_editing_tpu.infer.quant import (max_quant_error,
                                                quantize_tree)
    from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                        load_checkpoint)
    from speech_editing_tpu.training.tasks.spec_denoiser import build_model
    from speech_editing_tpu.utils.audio.griffin_lim import mel2wav_griffin_lim
    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    data_dir = hp["binary_data_dir"]
    # the structured corpus carries no phone_set.json; the task falls back
    # to hp['vocab_size'] (default 100) — match it so the checkpoint fits
    vocab = int(hp.get("vocab_size", 100))
    model = build_model(vocab, hp)
    ckpt_path, steps = get_last_checkpoint(ckpt_dir)
    state = load_checkpoint(ckpt_path)["state"]
    params = state.params if hasattr(state, "params") else state["params"]
    variables = {"params": params}
    qvariables = {"params": quantize_tree(params, min_size=1024)}
    qerr = max_quant_error(params, qvariables["params"])

    from speech_editing_tpu.infer.quant import dequantize_tree

    infer_fp = jax.jit(
        lambda v, txt, tm, m2p, mels, f0, uv, rng: model.apply(
            v, txt, tm, m2p, None, mels, f0, uv, infer=True, rng=rng))
    infer_q = jax.jit(
        lambda v, txt, tm, m2p, mels, f0, uv, rng: model.apply(
            dequantize_tree(v), txt, tm, m2p, None, mels, f0, uv,
            infer=True, rng=rng))

    ds = IndexedDataset(os.path.join(data_dir, "test"))
    rows = {"fp32": {"mcd": [], "stoi": []}, "int8": {"mcd": [], "stoi": []}}
    for i in range(len(ds)):
        it = ds[i]
        mel = np.asarray(it["mel"], np.float32)
        t = len(mel)
        m0, m1 = t // 4, t // 4 + t // 2
        tm = np.zeros((t, 1), np.float32)
        tm[m0:m1] = 1.0
        ref = mel * (1 - tm)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        args_dev = (jnp.asarray(it["ph_token"])[None],
                    jnp.asarray(tm)[None], jnp.asarray(it["mel2ph"])[None],
                    jnp.asarray(ref)[None],
                    jnp.asarray(it["f0"])[None],
                    jnp.asarray((it["f0"] == 0).astype(np.float32))[None],
                    key[None])
        for name, fn, v in (("fp32", infer_fp, variables),
                            ("int8", infer_q, qvariables)):
            out = np.asarray(fn(v, *args_dev)["mel_out"], np.float32)[0]
            comp = out * tm + ref * (1 - tm)
            mcd, _, _ = get_metrics_mels(mel[m0:m1], comp[m0:m1])
            rows[name]["mcd"].append(mcd)
            sr = int(hp["audio_sample_rate"])
            wav_gt = mel2wav_griffin_lim(mel, sample_rate=sr,
                                         n_fft=hp["fft_size"],
                                         hop_size=hp["hop_size"])
            wav_p = mel2wav_griffin_lim(comp, sample_rate=sr,
                                        n_fft=hp["fft_size"],
                                        hop_size=hp["hop_size"])
            n = min(len(wav_gt), len(wav_p))
            rows[name]["stoi"].append(stoi(wav_gt[:n], wav_p[:n], sr))
        print(f"| item {i}: mcd fp32 {rows['fp32']['mcd'][-1]:.3f} "
              f"int8 {rows['int8']['mcd'][-1]:.3f}", flush=True)

    mcd_fp = float(np.mean(rows["fp32"]["mcd"]))
    mcd_q = float(np.mean(rows["int8"]["mcd"]))
    stoi_fp = float(np.mean(rows["fp32"]["stoi"]))
    stoi_q = float(np.mean(rows["int8"]["stoi"]))
    print(json.dumps({
        "metric": "quant_int8_mcd_delta_db",
        "value": round(mcd_q - mcd_fp, 4),
        "unit": (f"masked-region mel-MCD delta int8-fp32 (trained "
                 f"{steps}-step acceptance model, {len(ds)} test items, "
                 f"identical diffusion keys)"),
        "mcd_fp32": round(mcd_fp, 4), "mcd_int8": round(mcd_q, 4),
        "stoi_fp32": round(stoi_fp, 4), "stoi_int8": round(stoi_q, 4),
        "stoi_delta": round(stoi_q - stoi_fp, 4),
        "max_weight_quant_err": round(float(qerr), 6),
    }))


if __name__ == "__main__":
    main()
