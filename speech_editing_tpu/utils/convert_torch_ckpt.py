"""Torch checkpoint -> flax params converters.

Lets users of the reference toolkit bring their released checkpoints
(e.g. the pretrained HiFi-GAN ``model_ckpt_steps_2168000.ckpt``) to this
framework. Handles the layout differences:

* torch ``Conv1d.weight [out, in, k]``  -> flax ``Conv.kernel [k, in, out]``;
* torch ``ConvTranspose1d.weight [in, out, k]`` -> flax ``ConvTranspose``
  kernel [k, in, out] **flipped along k** (torch's transposed conv
  cross-correlates the flipped kernel relative to lax.conv_transpose);
* weight normalisation folded: ``w = g * v / ||v||`` (per output channel);
* grouped convs keep their grouped in-channel dim (flax
  ``feature_group_count`` expects kernel [k, in/g, out]).

The HiFi-GAN generator mapping below covers conv_pre / ups / resblocks /
conv_post of ``modules/vocoder/hifigan/hifigan.py:101-151``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _fold_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Return the effective weight for a (possibly weight-normed) module."""
    if f"{prefix}.weight_v" in sd:
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
        norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(-1)
                       ).reshape(-1, *([1] * (v.ndim - 1)))
        return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd[f"{prefix}.weight"], np.float32)


def torch_conv1d(sd, prefix) -> dict:
    w = _fold_weight_norm(sd, prefix)  # [out, in, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}  # [k, in, out]
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def torch_conv_transpose1d(sd, prefix) -> dict:
    w = _fold_weight_norm(sd, prefix)  # [in, out, k]
    k = np.transpose(w, (2, 0, 1))  # [k, in, out]
    out = {"kernel": k[::-1].copy()}  # flip along k
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def torch_linear(sd, prefix) -> dict:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"], np.float32).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def convert_hifigan_generator(state_dict: Dict[str, np.ndarray],
                              hp: dict) -> dict:
    """Reference HifiGanGenerator state_dict -> flax params for
    ``models.vocoder.HifiGanGenerator`` (same hp)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    params["conv_pre"] = torch_conv1d(sd, "conv_pre")
    n_up = len(hp["upsample_rates"])
    n_res = len(hp["resblock_kernel_sizes"])
    is_res1 = str(hp.get("resblock", "1")) == "1"
    for i in range(n_up):
        params[f"up_{i}"] = torch_conv_transpose1d(sd, f"ups.{i}")
        for j in range(n_res):
            flat = i * n_res + j
            block: dict = {}
            if is_res1:
                n_d = len(hp["resblock_dilation_sizes"][j])
                for d in range(n_d):
                    block[f"Conv_{2 * d}"] = torch_conv1d(
                        sd, f"resblocks.{flat}.convs1.{d}")
                    block[f"Conv_{2 * d + 1}"] = torch_conv1d(
                        sd, f"resblocks.{flat}.convs2.{d}")
            else:
                n_d = len(hp["resblock_dilation_sizes"][j])
                for d in range(n_d):
                    block[f"Conv_{d}"] = torch_conv1d(
                        sd, f"resblocks.{flat}.convs.{d}")
            params[f"resblock_{i}_{j}"] = block
    params["conv_post"] = torch_conv1d(sd, "conv_post")
    return params


def convert_diffnet(state_dict: Dict[str, np.ndarray],
                    residual_layers: int, prefix: str = "") -> dict:
    """Reference DiffNet state_dict
    (``modules/speech_editing/spec_denoiser/diffnet.py:84-130``) -> flax
    params for ``modules.wavenet.DiffNet``. ``prefix`` selects a sub-model
    inside a larger checkpoint (e.g. ``denoise_fn.``)."""
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: dict = {
        "input_projection": torch_conv1d(sd, "input_projection"),
        "mlp_1": torch_linear(sd, "mlp.0"),
        "mlp_2": torch_linear(sd, "mlp.2"),
        "skip_projection": torch_conv1d(sd, "skip_projection"),
        "output_projection": torch_conv1d(sd, "output_projection"),
    }
    for i in range(residual_layers):
        p = f"residual_layers.{i}"
        params[f"residual_{i}"] = {
            "dilated_conv": torch_conv1d(sd, f"{p}.dilated_conv"),
            "diffusion_projection": torch_linear(sd, f"{p}.diffusion_projection"),
            "conditioner_projection": torch_conv1d(sd, f"{p}.conditioner_projection"),
            "output_projection": torch_conv1d(sd, f"{p}.output_projection"),
        }
    return params


def torch_layernorm(sd, prefix) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def torch_embedding(sd, prefix) -> dict:
    return {"embedding": np.asarray(sd[f"{prefix}.weight"], np.float32)}


def convert_mel_encoder(sd, prefix: str = "") -> dict:
    """Reference MelEncoder (speech_editing/commons/mel_encoder.py) ->
    modules.predictors.MelEncoder."""
    p = prefix
    return {"fc1": torch_linear(sd, f"{p}encoder.0"),
            "fc2": torch_linear(sd, f"{p}encoder.2"),
            "fc_out": torch_linear(sd, f"{p}fc_out")}


def convert_predictor(sd, n_layers: int, prefix: str = "") -> dict:
    """Reference Duration/Pitch/EnergyPredictor (nar_tts_modules.py) ->
    modules.predictors.* (conv_{i}/ln_{i}/linear naming)."""
    out: dict = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = torch_conv1d(sd, f"{prefix}conv.{i}.0")
        out[f"ln_{i}"] = torch_layernorm(sd, f"{prefix}conv.{i}.2")
    lin_key = f"{prefix}linear.0.weight"
    out["linear"] = torch_linear(
        sd, f"{prefix}linear.0" if lin_key in sd else f"{prefix}linear")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pt file to a flat numpy state dict (handles the
    reference trainer's {'state_dict': {'model_gen': ...}} nesting)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload
    for key in ("state_dict",):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    if isinstance(sd, dict) and "model_gen" in sd:
        sd = sd["model_gen"]
    elif isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
