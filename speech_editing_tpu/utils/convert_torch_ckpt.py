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


def convert_mha(sd, prefix: str, num_heads: int) -> dict:
    """Reference fairseq-style MultiheadAttention
    (``modules/commons/transformer.py:138-486``) -> flax
    ``modules.transformer.MultiheadAttention`` (DenseGeneral q/k/v/out).

    The torch module packs QKV into one ``in_proj_weight [3E, E]``; flax
    keeps per-projection DenseGeneral kernels ``[E, h, d]`` (q/k/v) and
    ``[h, d, E]`` (out). Head order is preserved (row-major head-major
    flattening on both sides). The editing models always construct it with
    ``bias=False`` (transformer.py:499,539-545), so only weights exist.
    """
    w = np.asarray(sd[f"{prefix}.in_proj_weight"], np.float32)  # [3E, E]
    e = w.shape[1]
    h = num_heads
    d = e // h
    wq, wk, wv = w[:e], w[e:2 * e], w[2 * e:]
    out: dict = {
        "q_proj": {"kernel": wq.T.reshape(e, h, d)},
        "k_proj": {"kernel": wk.T.reshape(e, h, d)},
        "v_proj": {"kernel": wv.T.reshape(e, h, d)},
        "out_proj": {"kernel": np.asarray(
            sd[f"{prefix}.out_proj.weight"], np.float32).T.reshape(h, d, e)},
    }
    if f"{prefix}.in_proj_bias" in sd:
        b = np.asarray(sd[f"{prefix}.in_proj_bias"], np.float32)
        out["q_proj"]["bias"] = b[:e].reshape(h, d)
        out["k_proj"]["bias"] = b[e:2 * e].reshape(h, d)
        out["v_proj"]["bias"] = b[2 * e:].reshape(h, d)
        out["out_proj"]["bias"] = np.asarray(
            sd[f"{prefix}.out_proj.bias"], np.float32)
    return out


def convert_ffn(sd, prefix: str, padding: str = "SAME") -> dict:
    """TransformerFFNLayer (transformer.py:76-135) -> flax ConvFFN.
    'LEFT' (causal) layers wrap the conv in a Sequential(pad, conv), so the
    conv weights live under ``ffn_1.1``."""
    conv_key = f"{prefix}.ffn_1" if padding == "SAME" else f"{prefix}.ffn_1.1"
    return {"ffn_1": torch_conv1d(sd, conv_key),
            "ffn_2": torch_linear(sd, f"{prefix}.ffn_2")}


def convert_enc_sa_layer(sd, prefix: str, num_heads: int) -> dict:
    """EncSALayer (transformer.py:489-529) -> flax EncSALayer."""
    return {
        "layer_norm1": torch_layernorm(sd, f"{prefix}.layer_norm1"),
        "self_attn": convert_mha(sd, f"{prefix}.self_attn", num_heads),
        "layer_norm2": torch_layernorm(sd, f"{prefix}.layer_norm2"),
        "ffn": convert_ffn(sd, f"{prefix}.ffn", "SAME"),
    }


def convert_dec_sa_layer(sd, prefix: str, num_heads: int) -> dict:
    """DecSALayer (transformer.py:532-614) -> flax DecSALayer (causal FFN
    + cross-attention)."""
    return {
        "layer_norm1": torch_layernorm(sd, f"{prefix}.layer_norm1"),
        "self_attn": convert_mha(sd, f"{prefix}.self_attn", num_heads),
        "layer_norm2": torch_layernorm(sd, f"{prefix}.layer_norm2"),
        "encoder_attn": convert_mha(sd, f"{prefix}.encoder_attn", num_heads),
        "layer_norm3": torch_layernorm(sd, f"{prefix}.layer_norm3"),
        "ffn": convert_ffn(sd, f"{prefix}.ffn", "LEFT"),
    }


def convert_fft_blocks(sd, prefix: str, num_layers: int, num_heads: int,
                       use_pos_embed: bool = False,
                       use_last_norm: bool = True) -> dict:
    """FFTBlocks (transformer.py:653-708) -> flax FFTBlocks. Torch wraps
    each EncSALayer in a TransformerEncoderLayer as ``.op``
    (transformer.py:617-629)."""
    out: dict = {}
    if use_pos_embed and f"{prefix}.pos_embed_alpha" in sd:
        out["pos_embed_alpha"] = np.asarray(
            sd[f"{prefix}.pos_embed_alpha"], np.float32)
    for i in range(num_layers):
        out[f"layers_{i}"] = convert_enc_sa_layer(
            sd, f"{prefix}.layers.{i}.op", num_heads)
    if use_last_norm and f"{prefix}.layer_norm.weight" in sd:
        out["layer_norm"] = torch_layernorm(sd, f"{prefix}.layer_norm")
    return out


def convert_fastspeech_encoder(sd, prefix: str, num_layers: int,
                               num_heads: int) -> dict:
    """FastSpeechEncoder (transformer.py:710-743) -> flax FastSpeechEncoder
    (token embed + 'fft' FFTBlocks, no pos-embed alpha)."""
    return {
        "embed_tokens": {"embed": torch_embedding(sd, f"{prefix}.embed_tokens")},
        "fft": convert_fft_blocks(sd, prefix, num_layers, num_heads,
                                  use_pos_embed=False),
    }


def convert_fastspeech_decoder(sd, prefix: str, num_layers: int,
                               num_heads: int) -> dict:
    """FastSpeechDecoder (transformer.py:745-747) -> flax FastSpeechDecoder
    ('fft' FFTBlocks with learned pos-embed alpha)."""
    return {"fft": convert_fft_blocks(sd, prefix, num_layers, num_heads,
                                      use_pos_embed=True)}


def convert_fastspeech(sd, hp: dict, prefix: str = "",
                       include_decoder: bool = True) -> dict:
    """Full reference FastSpeech conditioner
    (``modules/speech_editing/spec_denoiser/fs.py:49-81`` / the plain
    ``modules/tts/fs.py``) -> flax params for ``models.fs.FastSpeech``.

    Covers: fft encoder/decoder, mel_out, dur_embed + DurationPredictor,
    pitch_embed + PitchPredictor, spk embed/id style projections. Only the
    'fft' encoder/decoder registries are supported (the released FluentSpeech
    checkpoints use fft/fft per ``egs/spec_denoiser.yaml``).
    """
    p = prefix
    enc_type = hp.get("encoder_type", "fft")
    if enc_type not in ("fft", "conv") or hp.get("decoder_type", "fft") != "fft":
        raise NotImplementedError(
            "checkpoint conversion supports encoder_type in (fft, conv), "
            "decoder_type 'fft'")
    heads = hp["num_heads"]
    if enc_type == "fft":
        encoder = convert_fastspeech_encoder(
            sd, f"{p}encoder", hp["enc_layers"], heads)
    else:
        encoder = convert_text_conv_encoder(
            sd, len(hp["enc_dilations"]), hp.get("layers_in_block", 2),
            prefix=f"{p}encoder.")
    params: dict = {
        "encoder": encoder,
        "dur_predictor": convert_predictor(
            sd, hp["dur_predictor_layers"], prefix=f"{p}dur_predictor."),
    }
    if f"{p}dur_embed.weight" in sd:
        # only the spec_denoiser masked-fs variant owns dur_embed; the plain
        # modules/tts/fs.py FastSpeech has none (merge onto an init tree)
        params["dur_embed"] = {"embed": torch_embedding(sd, f"{p}dur_embed")}
    if include_decoder:
        # skip_decoder conditioners (all editing models) never materialize
        # the flax decoder/mel_out params, so these torch weights are dropped
        params["decoder"] = convert_fastspeech_decoder(
            sd, f"{p}decoder", hp["dec_layers"], heads)
        params["mel_out_proj"] = torch_linear(sd, f"{p}mel_out")
    if hp.get("use_pitch_embed"):
        params["pitch_embed"] = {"embed": torch_embedding(sd, f"{p}pitch_embed")}
        params["pitch_predictor"] = convert_predictor(
            sd, 5, prefix=f"{p}pitch_predictor.")
    if hp.get("use_spk_embed"):
        params["spk_embed_proj"] = torch_linear(sd, f"{p}spk_embed_proj")
    if hp.get("use_spk_id"):
        params["spk_id_proj"] = {"embed": torch_embedding(sd, f"{p}spk_id_proj")}
    return params


def convert_gaussian_diffusion(sd, hp: dict) -> dict:
    """Full reference FluentSpeech checkpoint
    (``modules/speech_editing/spec_denoiser/spec_denoiser.py:16-72``:
    fs + mel_encoder + denoise_fn; schedule buffers are recomputed from hp
    on our side) -> flax params for
    ``models.spec_denoiser.GaussianDiffusion``."""
    return {
        "fs": convert_fastspeech(sd, hp, prefix="fs.", include_decoder=False),
        "mel_encoder": convert_mel_encoder(sd, prefix="mel_encoder."),
        "denoise_fn": convert_diffnet(sd, hp["residual_layers"],
                                      prefix="denoise_fn."),
    }


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


# -- round-3 family converters (VERDICT r2 #2) -------------------------------


def merge_params(base: dict, overrides: dict) -> dict:
    """Recursively overlay converted leaves onto a freshly-initialised flax
    param tree. Needed for models whose flax tree carries extra (unused)
    submodules the torch state_dict lacks — e.g. our FastSpeech always
    builds ``dur_embed`` but the reference's PLAIN fs.py variant has none."""
    out = dict(base)
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            out[k] = merge_params(base[k], v)
        else:
            out[k] = v
    return out


def torch_dense_from_conv1(sd, prefix) -> dict:
    """kernel-size-1 Conv1d == Dense (espnet MultiLayeredConv1d w_1/w_2,
    conformer pointwise convs)."""
    w = _fold_weight_norm(sd, prefix)  # [out, in, 1]
    out = {"kernel": w[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def fold_batchnorm(sd, prefix, eps: float = 1e-5) -> dict:
    """Eval-mode BatchNorm1d == per-channel affine: scale/bias for the
    'affine' norm in modules.conformer (running stats folded)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def convert_conv_blocks(sd, n_blocks: int, layers_in_block: int = 2,
                        prefix: str = "") -> dict:
    """Reference ConvBlocks (modules/commons/conv.py:68-117) -> flax
    modules.conv.ConvBlocks (res_{j}.norm/conv/proj_{i}, last_norm,
    post_net1). Torch block i = Sequential(norm, conv, scale-lambda, GELU,
    1x1 conv) under ``res_blocks.{j}.blocks.{i}``."""
    p = prefix
    out: dict = {}
    for j in range(n_blocks):
        blk: dict = {}
        for i in range(layers_in_block):
            bp = f"{p}res_blocks.{j}.blocks.{i}"
            blk[f"norm_{i}"] = torch_layernorm(sd, f"{bp}.0")
            blk[f"conv_{i}"] = torch_conv1d(sd, f"{bp}.1")
            blk[f"proj_{i}"] = torch_conv1d(sd, f"{bp}.4")
        out[f"res_{j}"] = blk
    out["last_norm"] = torch_layernorm(sd, f"{p}last_norm")
    out["post_net1"] = torch_conv1d(sd, f"{p}post_net1")
    return out


def convert_text_conv_encoder(sd, n_blocks: int, layers_in_block: int = 2,
                              prefix: str = "") -> dict:
    """Reference TextConvEncoder (conv.py:119-140; ConvBlocks params live
    flat on the module) -> flax TextConvEncoder (nested under 'conv')."""
    return {
        "embed_tokens": {"embed": torch_embedding(sd, f"{prefix}embed_tokens")},
        "conv": convert_conv_blocks(sd, n_blocks, layers_in_block,
                                    prefix=prefix),
    }


def convert_cond_conv_blocks(sd, n_blocks: int, layers_in_block: int = 2,
                             prefix: str = "") -> dict:
    """Reference ConditionalConvBlocks (conv.py:142-167) -> flax
    ConditionalConvBlocks (g_prenet + nested 'conv')."""
    return {
        "g_prenet": torch_conv1d(sd, f"{prefix}g_prenet"),
        "conv": convert_conv_blocks(sd, n_blocks, layers_in_block,
                                    prefix=prefix),
    }


def convert_transformer_encoder(sd, prefix: str, num_layers: int,
                                num_heads: int) -> dict:
    """speech_editing/commons TransformerEncoder (:712-747) -> flax
    modules.transformer.TransformerEncoder (FastSpeechEncoder under 'enc').
    The torch module also owns an UNUSED pre_net (forward_embedding comments
    it out) whose weights are intentionally dropped."""
    return {"enc": convert_fastspeech_encoder(sd, prefix, num_layers,
                                              num_heads)}


def convert_transformer_decoder(sd, prefix: str, num_layers: int,
                                num_heads: int) -> dict:
    """speech_editing/commons TransformerDecoder (:750-811) -> flax
    TransformerDecoder (pos_embed_alpha + DecSALayers + last norm)."""
    out: dict = {"pos_embed_alpha": np.asarray(
        sd[f"{prefix}.pos_embed_alpha"], np.float32)}
    for i in range(num_layers):
        out[f"layers_{i}"] = convert_dec_sa_layer(
            sd, f"{prefix}.layers.{i}.op", num_heads)
    out["layer_norm"] = torch_layernorm(sd, f"{prefix}.layer_norm")
    return out


def convert_campnet(sd, hp: dict) -> dict:
    """Reference CampNet (campnet/campnet.py:14-69) -> flax
    models.campnet.CampNet params. Unused parent-FastSpeech leftovers
    (pitch/mel_out etc., never deleted by the torch ctor) are dropped."""
    return {
        "encoder": convert_transformer_encoder(sd, "encoder", 3, 2),
        "mel_encoder": convert_mel_encoder(sd, prefix="mel_encoder."),
        "decoder_coarse": convert_transformer_decoder(
            sd, "decoder_coarse", 6, 2),
        "decoder_fine": convert_conv_blocks(sd, 5, 2,
                                            prefix="decoder_fine."),
        "mel_out_coarse": torch_linear(sd, "mel_out_coarse"),
        "mel_out_fine": torch_linear(sd, "mel_out_fine"),
        "mask_emb": np.asarray(sd["mask_emb"], np.float32),
    }


def convert_lstm(sd, prefix: str, num_layers: int = 2) -> dict:
    """torch nn.LSTM (packed [4H,*] i|f|g|o gates, dual biases) -> the
    scanned flax stack (per-gate kernels ii/if/ig/io + hi/hf/hg/ho, the two
    torch biases summed into the h-side bias)."""
    cells: dict = {}
    for layer in range(num_layers):
        w_ih = np.asarray(sd[f"{prefix}.weight_ih_l{layer}"], np.float32)
        w_hh = np.asarray(sd[f"{prefix}.weight_hh_l{layer}"], np.float32)
        b = (np.asarray(sd[f"{prefix}.bias_ih_l{layer}"], np.float32)
             + np.asarray(sd[f"{prefix}.bias_hh_l{layer}"], np.float32))
        h = w_hh.shape[1]
        cell: dict = {}
        for gi, gate in enumerate(("i", "f", "g", "o")):
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{gate}"] = {"kernel": w_ih[sl].T}
            cell[f"h{gate}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        cells[f"cell_{layer}"] = cell
    return cells


def convert_lstm_decoder(sd, prefix: str, num_layers: int = 2) -> dict:
    """Reference lstm_decoder (editspeech/lstm.py:33-50) -> flax
    modules.lstm.LSTMDecoder ('stack' cells + 'linear' head)."""
    return {
        "stack": convert_lstm(sd, f"{prefix}lstm", num_layers),
        "linear": torch_linear(sd, f"{prefix}linear"),
    }


def convert_editspeech(sd, hp: dict) -> dict:
    """Reference EditSpeech (editspeech/editspeech.py:17-49) -> flax
    models.editspeech.EditSpeech params (merge onto an init tree: the flax
    FastSpeech owns a dur_embed the plain torch fs.py variant lacks)."""
    return {
        "fs": convert_fastspeech(sd, hp, prefix="fs.",
                                 include_decoder=False),
        "proj_in": torch_linear(sd, "decoder.proj_in"),
        "prenet": convert_mel_encoder(sd, prefix="decoder.prenet."),
        "forward_decoder": convert_lstm_decoder(sd,
                                                "decoder.forward_decoder."),
        "backward_decoder": convert_lstm_decoder(sd,
                                                 "decoder.backward_decoder."),
    }


def convert_conformer_layers(sd, prefix: str, num_layers: int,
                             num_heads: int = 4) -> dict:
    """Reference ConformerLayers (a3t_conformer.py:15-47 + espnet attn) ->
    flax modules.conformer.ConformerLayers built with norm_type='affine'
    (eval-mode BatchNorm folded into per-channel affines)."""
    out: dict = {}
    for i in range(num_layers):
        lp = f"{prefix}encoder_layers.{i}"
        att = f"{lp}.self_attn"
        e = np.asarray(sd[f"{att}.pos_bias_u"]).shape  # [h, d]
        layer = {
            "ff_macaron": {
                "w_1": torch_dense_from_conv1(sd, f"{lp}.feed_forward_macaron.w_1"),
                "w_2": torch_dense_from_conv1(sd, f"{lp}.feed_forward_macaron.w_2"),
            },
            "norm_ff_macaron": torch_layernorm(sd, f"{lp}.norm_ff_macaron"),
            "self_attn": {
                "linear_q": torch_linear(sd, f"{att}.linear_q"),
                "linear_k": torch_linear(sd, f"{att}.linear_k"),
                "linear_v": torch_linear(sd, f"{att}.linear_v"),
                "linear_out": torch_linear(sd, f"{att}.linear_out"),
                "linear_pos": torch_linear(sd, f"{att}.linear_pos"),
                "pos_bias_u": np.asarray(sd[f"{att}.pos_bias_u"], np.float32),
                "pos_bias_v": np.asarray(sd[f"{att}.pos_bias_v"], np.float32),
            },
            "norm_mha": torch_layernorm(sd, f"{lp}.norm_mha"),
            "conv": {
                "pointwise_conv1": torch_dense_from_conv1(
                    sd, f"{lp}.conv_module.pointwise_conv1"),
                "depthwise_conv": torch_conv1d(
                    sd, f"{lp}.conv_module.depthwise_conv"),
                "norm": fold_batchnorm(sd, f"{lp}.conv_module.norm"),
                "pointwise_conv2": torch_dense_from_conv1(
                    sd, f"{lp}.conv_module.pointwise_conv2"),
            },
            "norm_conv": torch_layernorm(sd, f"{lp}.norm_conv"),
            "ff": {
                "w_1": torch_dense_from_conv1(sd, f"{lp}.feed_forward.w_1"),
                "w_2": torch_dense_from_conv1(sd, f"{lp}.feed_forward.w_2"),
            },
            "norm_ff": torch_layernorm(sd, f"{lp}.norm_ff"),
            "norm_final": torch_layernorm(sd, f"{lp}.norm_final"),
        }
        out[f"layers_{i}"] = layer
    out["layer_norm"] = torch_layernorm(sd, f"{prefix}layer_norm")
    return out


def convert_a3t_postnet(sd, prefix: str = "a3t_postnet.",
                        n_layers: int = 5) -> dict:
    """Reference espnet Postnet (a3t_postnet.py:16-113, bias-free convs +
    BatchNorm) -> flax models.a3t.Postnet with norm_type='affine'."""
    out: dict = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = torch_conv1d(sd, f"{prefix}postnet.{i}.0")
        out[f"norm_{i}"] = fold_batchnorm(sd, f"{prefix}postnet.{i}.1")
    return out


def convert_a3t(sd, hp: dict) -> dict:
    """Reference A3T (a3t/a3t.py:14-64) -> flax models.a3t.A3T params
    (build the flax model with hp['espnet_bn_affine']=True). Unused parent
    FastSpeech leftovers are dropped."""
    return {
        "txt_embed": {"embed": torch_embedding(sd, "encoder.txt_embed")},
        "mel_embed": convert_mel_encoder(sd, prefix="encoder.mel_embed."),
        "seg_embed": {"embed": torch_embedding(sd, "encoder.seg_embed")},
        "encoder": convert_conformer_layers(sd, "encoder.", 4),
        "a3t_decoder": convert_conformer_layers(sd, "a3t_decoder.", 4),
        "a3t_postnet": convert_a3t_postnet(sd),
        "mel_out_decoder": torch_linear(sd, "mel_out_decoder"),
    }


def convert_stutter_gaussian_diffusion(sd, hp: dict) -> dict:
    """Reference StutterSpeech GaussianDiffusion
    (stutter_speech/spec_denoiser.py:19-27,159-199) -> flax
    models.stutter_speech.StutterGaussianDiffusion params."""
    return {
        "fs": convert_fastspeech(sd, hp, prefix="fs.",
                                 include_decoder=False),
        "mel_encoder": convert_mel_encoder(sd, prefix="mel_encoder."),
        "stutter_embed": {"embedding": np.asarray(
            sd["stutter_embed.weight"], np.float32)},
        "stutter_predictor": {
            "conv": convert_cond_conv_blocks(
                sd, 4, 2, prefix="stutter_predictor.conv."),
            "linear": torch_linear(sd, "stutter_predictor.linear"),
        },
        "denoise_fn": convert_diffnet(sd, hp["residual_layers"],
                                      prefix="denoise_fn."),
    }
