"""Training losses for acoustic/editing models, as pure JAX functions.

Capability parity with the reference task-layer losses:

* mel losses (l1/mse/ssim weighted spec string, ``tasks/tts/speech_base.py:219-257``,
  spec parsed like ``utils/audio/tts_utils`` "l1:0.5|ssim:0.5");
* duration losses pdur/wdur/sdur (``tasks/speech_editing/speech_editing_base.py:58-90``);
* pitch loss uv-BCE + f0-L1 (``speech_editing_base.py:92-108``).

TPU-first notes: the reference's dynamic ``word_id.max()+1`` scatter becomes a
static-width ``segment_sum`` over ``T_txt`` segments (a word count can never
exceed the token count), so everything jits with static shapes.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from speech_editing_tpu.ops.seq_ops import mel2token_to_dur, weights_nonzero_speech
from speech_editing_tpu.ops.ssim import ssim_map


def parse_mel_losses(spec: str) -> Dict[str, float]:
    """'l1:0.5|ssim:0.5' -> {'l1': 0.5, 'ssim': 0.5}."""
    out: Dict[str, float] = {}
    for part in spec.split("|"):
        if not part:
            continue
        if ":" in part:
            name, w = part.split(":")
            out[name] = float(w)
        else:
            out[part] = 1.0
    return out


def l1_loss(mel_out: jax.Array, target: jax.Array) -> jax.Array:
    w = weights_nonzero_speech(target)
    return jnp.sum(jnp.abs(mel_out - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


def mse_loss(mel_out: jax.Array, target: jax.Array) -> jax.Array:
    w = weights_nonzero_speech(target)
    return jnp.sum((mel_out - target) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)


def ssim_loss(mel_out: jax.Array, target: jax.Array, bias: float = 6.0) -> jax.Array:
    """1 - SSIM per frame, weighted by nonzero target frames
    (reference ssim_loss, speech_base.py:248-257)."""
    w = weights_nonzero_speech(target)
    smap = ssim_map(mel_out + bias, target + bias)  # [B, T, M]
    loss = (1.0 - smap)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


MEL_LOSS_FNS = {"l1": l1_loss, "mse": mse_loss, "ssim": ssim_loss}


def add_mel_loss(losses: dict, mel_out, target, mel_losses_spec: str,
                 postfix: str = ""):
    # loss tail always reduces in f32: with use_bf16 the model outputs (and
    # masks) arrive bf16, and a bf16 sum over millions of elements drifts —
    # upcasting HERE keeps the model compute bf16 but the metrics exact
    mel_out = mel_out.astype(jnp.float32)
    target = target.astype(jnp.float32)
    for name, lam in parse_mel_losses(mel_losses_spec).items():
        losses[f"{name}{postfix}"] = MEL_LOSS_FNS[name](mel_out, target) * lam


def dur_loss(losses: dict, dur_pred: jax.Array, mel2ph: jax.Array,
             txt_tokens: jax.Array, is_sil: jax.Array, hp) -> None:
    """Phoneme/word/sentence duration losses.

    dur_pred: [B, S] linear-scale predictions; is_sil: [B, S] float mask of
    silence tokens (computed host-side from the token encoder's sil set).
    """
    b, s = txt_tokens.shape
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    dur_gt = mel2token_to_dur(mel2ph, s).astype(jnp.float32) * nonpadding
    pdur = (jnp.log1p(dur_pred) - jnp.log1p(dur_gt)) ** 2
    losses["pdur"] = (jnp.sum(pdur * nonpadding)
                      / jnp.maximum(jnp.sum(nonpadding), 1.0)) * hp["lambda_ph_dur"]

    if hp.get("lambda_word_dur", 0) > 0:
        # word id = running count of silences, zeroed on the silence itself;
        # segment 0 collects silences and is dropped (reference :79-86).
        word_id = (jnp.cumsum(is_sil, -1) * (1 - is_sil)).astype(jnp.int32)
        seg_sum = jax.vmap(
            lambda wid, v: jax.ops.segment_sum(v, wid, num_segments=s + 1))
        word_dur_p = seg_sum(word_id, dur_pred)[:, 1:]
        word_dur_g = seg_sum(word_id, dur_gt)[:, 1:]
        wdur = (jnp.log1p(word_dur_p) - jnp.log1p(word_dur_g)) ** 2
        word_nonpadding = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = (jnp.sum(wdur * word_nonpadding)
                          / jnp.maximum(jnp.sum(word_nonpadding), 1.0)
                          ) * hp["lambda_word_dur"]
    if hp.get("lambda_sent_dur", 0) > 0:
        sent_p = jnp.sum(dur_pred, -1)
        sent_g = jnp.sum(dur_gt, -1)
        losses["sdur"] = jnp.mean(
            (jnp.log1p(sent_p) - jnp.log1p(sent_g)) ** 2) * hp["lambda_sent_dur"]


def pitch_loss(losses: dict, pitch_pred: jax.Array, f0: jax.Array,
               uv: jax.Array, mel2ph: jax.Array, hp) -> None:
    """uv BCE-with-logits + voiced-frame f0 L1 (reference :92-108)."""
    nonpadding = (mel2ph != 0).astype(jnp.float32)
    if hp.get("use_uv", True) and hp.get("pitch_type", "frame") == "frame":
        logits = pitch_pred[:, :, 1]
        bce = jnp.maximum(logits, 0) - logits * uv + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        losses["uv"] = (jnp.sum(bce * nonpadding)
                        / jnp.maximum(jnp.sum(nonpadding), 1.0)) * hp["lambda_uv"]
        nonpadding = nonpadding * (uv == 0).astype(jnp.float32)
    f0_l1 = jnp.abs(pitch_pred[:, :, 0] - f0)
    losses["f0"] = (jnp.sum(f0_l1 * nonpadding)
                    / jnp.maximum(jnp.sum(nonpadding), 1.0)) * hp["lambda_f0"]


def multi_focal_loss(logits: jax.Array, target: jax.Array,
                     alpha=(1e-3, 1.0, 0.0), gamma: float = 5.0,
                     smooth: float = 1e-6) -> jax.Array:
    """Class-weighted focal loss over [B, T, C] logits / [B, T] int targets
    (reference MultiFocalLoss, tasks/speech_editing/stutter_predictor.py:28-57;
    alpha = [fluent, stutter, pad])."""
    probs = jax.nn.softmax(logits, axis=-1)
    log_probs = jnp.log(jnp.maximum(probs, 1e-12))
    tgt = target.astype(jnp.int32)
    p_t = jnp.take_along_axis(probs, tgt[..., None], axis=-1)[..., 0] + smooth
    logp_t = jnp.take_along_axis(log_probs, tgt[..., None], axis=-1)[..., 0] + smooth
    a = jnp.asarray(alpha, logits.dtype)[tgt]
    return jnp.mean(-a * (1.0 - p_t) ** gamma * logp_t)


def cross_entropy_loss(logits: jax.Array, target: jax.Array,
                       ignore_index: int = -1) -> jax.Array:
    """Mean CE over [B, T, C] logits / [B, T] int targets, skipping
    ignore_index positions (torch CrossEntropyLoss semantics)."""
    tgt = target.astype(jnp.int32)
    valid = (tgt != ignore_index).astype(jnp.float32)
    tgt_safe = jnp.where(tgt == ignore_index, 0, tgt)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def sil_token_mask(txt_tokens: jax.Array, sil_token_ids) -> jax.Array:
    """[B, S] float mask of tokens in the silence-phoneme id set."""
    is_sil = jnp.zeros_like(txt_tokens, dtype=bool)
    for tid in sil_token_ids:
        is_sil = is_sil | (txt_tokens == tid)
    return is_sil.astype(jnp.float32)
