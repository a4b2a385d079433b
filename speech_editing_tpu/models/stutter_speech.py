"""StutterSpeech: stutter-conditioned masked diffusion + predictors (flax).

Capability parity with the StutterSpeech extension:

* :class:`FrameStutterHead` — in-model frame-level 3-class stutter predictor
  (``modules/speech_editing/stutter_speech/stutter_predictor.py:47-65``:
  ConditionalConvBlocks over decoder states conditioned on the mel encoding);
* :class:`StutterGaussianDiffusion` —
  ``modules/speech_editing/stutter_speech/spec_denoiser.py:159-199``: the
  FluentSpeech conditioner plus a 3-way ``stutter_embed`` added to the
  decoder input during training, stutter predictor output exposed for the
  CE/focal losses;
* :class:`StutterPredictor` — the standalone 16x-downsampled block
  classifier (``modules/speech_editing/spec_denoiser/stutter_predictor.py``):
  stride-2 conv mel prenet x4, text conv encoder (transfer-loaded from a
  trained editor), WN decoder conditioned on block-pooled expanded text.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.modules.conv import (ConditionalConvBlocks, ConvBlocks,
                                             TextConvEncoder)
from speech_editing_tpu.modules.predictors import MelEncoder
from speech_editing_tpu.modules.transformer import TokenEmbedding
from speech_editing_tpu.modules.wavenet import WN, DiffNet
from speech_editing_tpu.ops import diffusion as diff_ops
from speech_editing_tpu.ops.seq_ops import expand_states


class FrameStutterHead(nn.Module):
    hidden_size: int
    odim: int = 3

    @nn.compact
    def __call__(self, x, cond, nonpadding=None, train: bool = False):
        # num_layers=4, layers_in_block=2 (the reference keeps ConvBlocks'
        # default n=2; stutter_speech/stutter_predictor.py:51-55)
        x = ConditionalConvBlocks(
            self.hidden_size, self.hidden_size, (1,) * 4, 5,
            layers_in_block=2, dropout=0.3, name="conv")(
            x, cond, nonpadding, train=train)
        return nn.Dense(self.odim, name="linear")(x)


class StutterGaussianDiffusion(nn.Module):
    """Masked-conditional DDPM with stutter conditioning."""

    vocab_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        hp = self.hp
        self.fs = FastSpeech(self.vocab_size, hp)
        self.mel_encoder = MelEncoder(hidden_size=hp["hidden_size"])
        # plain embed, NO zeroed padding id: the reference builds this with
        # Embedding(3, h) (padding_idx=None) so class 0 = fluent keeps a
        # learnable vector (stutter_speech/spec_denoiser.py:25)
        self.stutter_embed = nn.Embed(
            3, hp["hidden_size"],
            embedding_init=nn.initializers.normal(
                hp["hidden_size"] ** -0.5))
        self.stutter_predictor = FrameStutterHead(hp["hidden_size"])
        self.denoise_fn = DiffNet(
            in_dims=self.out_dims, encoder_hidden=hp["hidden_size"],
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            remat=bool(hp.get("remat_diffnet", False)),
            allow_fused=bool(hp.get("fused_diffnet", False)))
        self.sched = diff_ops.DiffusionSchedule.create(
            schedule_type=hp.get("schedule_type", "vpsde"),
            timesteps=hp["timesteps"], time_scale=hp.get("timescale", 1))

    def denoise(self, x_t, t, cond, nonpadding=None):
        """Exposed for apply()-closure based external samplers."""
        return self.denoise_fn(x_t, t, cond, nonpadding)

    def compute_cond(self, txt_tokens, time_mel_masks, stutter_mel_masks,
                     mel2ph, spk_embed, ref_mels, f0, uv,
                     infer: bool = True, use_pred_mel2ph=False,
                     use_pred_pitch=False):
        """Conditioner only (fs states + stutter embed [train] + masked-mel
        encoding), mirroring the reference forward's cond construction
        (stutter_speech/spec_denoiser.py:164-179) for external drivers and
        the conversion-parity harness."""
        ret = self.fs(txt_tokens, time_mel_masks, mel2ph, spk_embed, f0, uv,
                      skip_decoder=True, infer=infer,
                      use_pred_mel2ph=use_pred_mel2ph,
                      use_pred_pitch=use_pred_pitch)
        decoder_inp = ret["decoder_inp"]
        mel2ph = ret["mel2ph"]
        tgt_nonpadding = (mel2ph > 0)[:, :, None].astype(decoder_inp.dtype)
        stutter_cond = self.mel_encoder(ref_mels) * tgt_nonpadding
        ret["stutter_predictor_out"] = self.stutter_predictor(
            decoder_inp, stutter_cond, tgt_nonpadding)
        if not infer:
            oh = jax.nn.one_hot(stutter_mel_masks.astype(jnp.int32), 3,
                                dtype=self.stutter_embed.embedding.dtype)
            decoder_inp = decoder_inp + jax.lax.dot_general(
                oh, self.stutter_embed.embedding,
                (((oh.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST) * tgt_nonpadding
        ret["cond"] = decoder_inp + self.mel_encoder(
            ref_mels * (1 - time_mel_masks)) * tgt_nonpadding
        return ret

    def __call__(self, txt_tokens, time_mel_masks, stutter_mel_masks, mel2ph,
                 spk_embed, ref_mels, f0, uv, energy=None,
                 infer: bool = False, use_pred_mel2ph: bool = False,
                 use_pred_pitch: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False):
        """stutter_mel_masks [B,T] int (0 fluent / 1 stutter / 2 pad)."""
        if rng is None:
            rng = self.make_rng("diffusion")
        ret = self.fs(txt_tokens, time_mel_masks, mel2ph, spk_embed, f0, uv,
                      energy, skip_decoder=True, infer=infer,
                      use_pred_mel2ph=use_pred_mel2ph,
                      use_pred_pitch=use_pred_pitch, train=train)
        decoder_inp = ret["decoder_inp"]
        mel2ph = ret["mel2ph"]
        tgt_nonpadding = (mel2ph > 0)[:, :, None].astype(decoder_inp.dtype)

        stutter_cond = self.mel_encoder(ref_mels) * tgt_nonpadding
        ret["stutter_predictor_out"] = self.stutter_predictor(
            decoder_inp, stutter_cond, tgt_nonpadding, train=train)
        if not infer:
            # one-hot matmul lookup: frame-rate gather backward is a slow
            # TPU scatter; 0/1 matmul is exact and MXU-friendly
            oh = jax.nn.one_hot(stutter_mel_masks.astype(jnp.int32), 3,
                                dtype=self.stutter_embed.embedding.dtype)
            decoder_inp = decoder_inp + jax.lax.dot_general(
                oh, self.stutter_embed.embedding,
                (((oh.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST) * tgt_nonpadding
        cond = decoder_inp + self.mel_encoder(
            ref_mels * (1 - time_mel_masks)) * tgt_nonpadding

        # frame-padding mask for DiffNet (no-op at exact fit; makes
        # frame-bucket padding inert for batched serving — see
        # spec_denoiser.py); ref_pad_compat keeps reference numerics
        np_mask = (None if self.hp.get("ref_pad_compat")
                   else tgt_nonpadding)
        b = txt_tokens.shape[0]
        if not infer:
            k_t, k_noise = jax.random.split(rng)
            t = jax.random.randint(k_t, (b,), 0, self.sched.num_timesteps + 1)
            noise = jax.random.normal(k_noise, ref_mels.shape, ref_mels.dtype)
            x_t = diff_ops.diffuse(self.sched, ref_mels, t, noise) * tgt_nonpadding
            ret["mel_out"] = self.denoise_fn(x_t, t, cond, np_mask) * tgt_nonpadding
        else:
            big_t = self.sched.num_timesteps
            # mask x at every step like the training branch masks x_t —
            # padded frames must stay zero (see spec_denoiser.py)
            if diff_ops.is_per_row_keys(rng):
                # request-level determinism for batched serving: row j's
                # noise depends only on (rng[j], step) — invariant to row
                # index, batch composition and frame-bucket padding
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
                x = jax.random.normal(sub, (b, cond.shape[1], self.out_dims),
                                      cond.dtype) * tgt_nonpadding
                for i in range(big_t - 1, -1, -1):
                    t = jnp.full((b,), i, jnp.int32)
                    key, sub = jax.random.split(key)
                    x0_pred = self.denoise_fn(x, t, cond, np_mask)
                    x = diff_ops.q_posterior_sample(
                        self.sched, x0_pred, x, t, sub) * tgt_nonpadding
            ret["mel_out"] = x
        return ret


class ConvMelPrenet(nn.Module):
    """4x stride-2 convs -> 16x time downsample + linear
    (spec_denoiser/stutter_predictor.py:15-35)."""

    hidden_size: int = 192

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(self.hidden_size, (3,), strides=(2,), padding=((1, 1),),
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Dense(self.hidden_size, name="fc_out")(x)


class StutterPredictor(nn.Module):
    """Standalone block-level (16x downsampled) 3-class stutter classifier."""

    vocab_size: int
    hp: Any
    block_size: int = 16

    def setup(self):
        hp = self.hp
        h = hp["hidden_size"]
        self.hidden_size = h
        self.txt_encoder = TextConvEncoder(
            self.vocab_size, h, h, tuple(hp["enc_dilations"]),
            hp["enc_kernel_size"], norm_type=hp.get("enc_dec_norm", "ln"),
            layers_in_block=hp.get("layers_in_block", 2),
            post_net_kernel=hp.get("enc_post_net_kernel", 3))
        self.mel_prenet = ConvMelPrenet(hidden_size=h)
        self.mel_convs = ConvBlocks(h, h, (1,) * 5, kernel_size=5,
                                    layers_in_block=2)
        self.decoder_text_prenet = ConvMelPrenet(hidden_size=h)
        self.decoder = WN(h, kernel_size=5, dilation_rate=1, n_layers=4,
                          c_cond=h, dropout=0.3)
        self.out_proj = nn.Dense(3, use_bias=False)
        self.drop = nn.Dropout(0.3)

    def __call__(self, txt_tokens, mels, mel2ph, infer: bool = False,
                 train: bool = False):
        """mels [B,T,80] with T % 16 == 0 -> logits [B, T//16, 3]."""
        b, t = mel2ph.shape
        txt_nonpadding = (txt_tokens > 0).astype(jnp.float32)[:, :, None]
        txt_embed = self.txt_encoder(txt_tokens) * txt_nonpadding

        blocks = t // self.block_size
        mel_nonpadding = (mel2ph > 0).astype(jnp.float32)
        block_nonpadding = (mel_nonpadding.reshape(
            b, blocks, self.block_size).sum(-1) > 0).astype(jnp.float32)[:, :, None]
        mel_embed = self.mel_convs(self.mel_prenet(mels)) * block_nonpadding

        txt_embed = self.drop(txt_embed, deterministic=not train)
        mel_embed = self.drop(mel_embed, deterministic=not train)

        expanded_txt = expand_states(txt_embed, mel2ph)
        condition = self.decoder_text_prenet(expanded_txt) * block_nonpadding
        dec = self.decoder(mel_embed, cond=condition, train=train)
        logits = self.out_proj(dec) * block_nonpadding
        return {"logits": logits, "attn": None}
