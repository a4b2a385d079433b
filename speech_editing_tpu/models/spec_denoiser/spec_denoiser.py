"""FluentSpeech masked-conditional mel DDPM (flax.linen).

Parity surface: ``modules/speech_editing/spec_denoiser/spec_denoiser.py``
(GaussianDiffusion :16-196). TPU-first re-design:

* schedule buffers are a :class:`~speech_editing_tpu.ops.diffusion.DiffusionSchedule`
  pytree, not module buffers;
* the reverse process is ``lax.scan`` over T denoise steps (ops.diffusion.
  p_sample_loop) — the whole inference is ONE XLA program;
* mel tensors stay ``[B, T, 80]`` feature-last end to end (the reference's
  ``[B, 1, M, T]`` NCHW juggling disappears);
* randomness (timestep draw, q-sample noise, reverse noise) comes from an
  explicit PRNG key threaded by the caller.

Conditioning (reference :154-176): FastSpeech states expanded to frame rate
(+ masked dur/pitch conditioning) + MelEncoder(ref_mels * (1 - mask)).
The denoiser predicts x0 directly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.modules.predictors import MelEncoder
from speech_editing_tpu.modules.wavenet import DiffNet
from speech_editing_tpu.ops import diffusion as diff_ops


class GaussianDiffusion(nn.Module):
    vocab_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        hp = self.hp
        self.fs = FastSpeech(self.vocab_size, hp)
        self.mel_encoder = MelEncoder(hidden_size=hp["hidden_size"])
        self.denoise_fn = DiffNet(
            in_dims=self.out_dims,
            encoder_hidden=hp["hidden_size"],
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            remat=bool(hp.get("remat_diffnet", False)),
            allow_fused=bool(hp.get("fused_diffnet", False)))
        self.sched = diff_ops.DiffusionSchedule.create(
            schedule_type=hp.get("schedule_type", "vpsde"),
            timesteps=hp["timesteps"], time_scale=hp.get("timescale", 1))

    def denoise(self, x_t, t, cond, nonpadding=None):
        """Exposed for apply()-closure based external samplers
        (e.g. ops.diffusion.p_sample_loop via lax.scan)."""
        return self.denoise_fn(x_t, t, cond, nonpadding)

    def predict_durations(self, txt_tokens, time_mel_masks, masked_mel2ph,
                          masked_dur, spk_embed=None):
        """Duration-inpainting sub-forward for the region-edit API
        (reference inference/tts/spec_denoiser.py:84-98): encoder + style on
        the EDITED tokens, duration predictor conditioned on the masked
        ground-truth durations, length-regulated to a predicted mel2ph."""
        encoder_out = self.fs.encoder(txt_tokens)
        src_nonpadding = (txt_tokens > 0)[:, :, None].astype(encoder_out.dtype)
        style_embed = self.fs.forward_style_embed(spk_embed, None)
        dur_inp = (encoder_out + style_embed) * src_nonpadding
        ret: dict = {}
        mel2ph_pred = self.fs.forward_dur(
            dur_inp, time_mel_masks, masked_mel2ph, txt_tokens, ret,
            masked_dur=masked_dur, use_pred_mel2ph=True)
        return {"mel2ph": mel2ph_pred, "dur": ret["dur"]}

    def compute_cond(self, txt_tokens, time_mel_masks, mel2ph, spk_embed,
                     ref_mels, f0, uv, use_pred_mel2ph=False,
                     use_pred_pitch=False):
        """Conditioner only (fs states + masked-mel encoding), for inference
        drivers that run the reverse scan outside the module."""
        ret = self.fs(txt_tokens, time_mel_masks, mel2ph, spk_embed, f0, uv,
                      skip_decoder=True, infer=True,
                      use_pred_mel2ph=use_pred_mel2ph,
                      use_pred_pitch=use_pred_pitch)
        tgt_nonpadding = (ret["mel2ph"] > 0)[:, :, None].astype(
            ret["decoder_inp"].dtype)
        ret["cond"] = ret["decoder_inp"] + self.mel_encoder(
            ref_mels * (1 - time_mel_masks)) * tgt_nonpadding
        return ret

    def __call__(self, txt_tokens, time_mel_masks, mel2ph, spk_embed,
                 ref_mels, f0, uv, energy=None, infer: bool = False,
                 use_pred_mel2ph: bool = False, use_pred_pitch: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False):
        """txt_tokens [B,S]; time_mel_masks [B,T,1]; mel2ph [B,T];
        spk_embed [B,256]; ref_mels [B,T,80]; f0/uv [B,T]."""
        if rng is None:
            rng = self.make_rng("diffusion")
        # ablation: spec_denoiser_normal drops the masked dur/pitch
        # conditioning (reference spec_denoiser_normal.py) — the conditioner
        # then behaves like plain FastSpeech
        fs_masks = time_mel_masks if self.hp.get("use_masked_cond", True) else None
        ret = self.fs(txt_tokens, fs_masks, mel2ph, spk_embed, f0, uv,
                      energy, skip_decoder=True, infer=infer,
                      use_pred_mel2ph=use_pred_mel2ph,
                      use_pred_pitch=use_pred_pitch, train=train)
        decoder_inp = ret["decoder_inp"]
        mel2ph = ret["mel2ph"]
        tgt_nonpadding = (mel2ph > 0)[:, :, None].astype(decoder_inp.dtype)
        cond = decoder_inp + self.mel_encoder(
            ref_mels * (1 - time_mel_masks)) * tgt_nonpadding

        # frame-padding mask for DiffNet's dilated convs (no-op at exact
        # fit; makes frame-bucket padding inert for batched serving);
        # ref_pad_compat keeps the reference's unmasked convs for
        # padded-input torch-parity checks
        np_mask = (None if self.hp.get("ref_pad_compat")
                   else tgt_nonpadding)
        b = txt_tokens.shape[0]
        if self.hp.get("no_diffusion"):
            # one-shot ablation (reference yq_wo_diff.py): the denoiser maps
            # the conditioning straight to mel, no diffusion process
            t0 = jnp.zeros((b,), jnp.int32)
            x0 = jnp.zeros((b, cond.shape[1], self.out_dims), jnp.float32)
            ret["mel_out"] = self.denoise_fn(x0, t0, cond, np_mask) * tgt_nonpadding
            return ret
        if not infer:
            k_t, k_noise = jax.random.split(rng)
            t = jax.random.randint(k_t, (b,), 0, self.sched.num_timesteps + 1)
            noise = jax.random.normal(k_noise, ref_mels.shape, ref_mels.dtype)
            x_t = diff_ops.diffuse(self.sched, ref_mels, t, noise) * tgt_nonpadding
            x0_pred = self.denoise_fn(x_t, t, cond, np_mask) * tgt_nonpadding
            ret["mel_out"] = x0_pred
        else:
            # Reverse process, unrolled over the (small, static) T steps so the
            # shared DiffNet params thread naturally through linen; the whole
            # loop is still one XLA program under jit. (lax.scan over a linen
            # submodule needs lifted transforms; for T<=8 unrolling compiles to
            # the same fused program.)
            # mask x at every step like the training branch masks x_t:
            # padded frames (mel2ph==0) must stay zero or their noise leaks
            # into real frames through DiffNet's conv receptive field
            # (matters for batched serving / padded test batches)
            big_t = self.sched.num_timesteps
            if diff_ops.is_per_row_keys(rng):
                # request-level determinism (batched serving): row j's
                # noise depends only on (rng[j], step) — invariant to row
                # index, batch composition, and (via the threefry prefix
                # property) frame-bucket padding
                t_mel = cond.shape[1]

                def noise_at(step):
                    return diff_ops.per_row_noise(
                        rng, step, (t_mel, self.out_dims), cond.dtype)

                x = noise_at(big_t) * tgt_nonpadding
                for i in range(big_t - 1, -1, -1):
                    t = jnp.full((b,), i, jnp.int32)
                    x0_pred = self.denoise_fn(x, t, cond, np_mask)
                    x = diff_ops.q_posterior_sample(
                        self.sched, x0_pred, x, t,
                        noise=noise_at(i)) * tgt_nonpadding
            else:
                key, sub = jax.random.split(rng)
                x = jax.random.normal(
                    sub, (b, cond.shape[1], self.out_dims),
                    cond.dtype) * tgt_nonpadding
                for i in range(big_t - 1, -1, -1):
                    t = jnp.full((b,), i, jnp.int32)
                    key, sub = jax.random.split(key)
                    x0_pred = self.denoise_fn(x, t, cond, np_mask)
                    x = diff_ops.q_posterior_sample(
                        self.sched, x0_pred, x, t, sub) * tgt_nonpadding
            ret["mel_out"] = x
        return ret
