"""FastSpeech2 (original variant): energy conditioning + CWT-domain pitch.

Parity surface: ``modules/tts/fs2_orig.py`` — energy embedding/predictor
(:16-21, :90-96), CWT pitch predictor with 11-dim output (10 scales + uv)
and per-utterance mean/std stats head (:22-29, :67-88), falling back to the
base frame-level pitch path otherwise.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.modules.predictors import EnergyPredictor, PitchPredictor
from speech_editing_tpu.modules.transformer import TokenEmbedding
from speech_editing_tpu.ops.seq_ops import expand_states, predictor_grad_scale
from speech_editing_tpu.utils.audio.cwt import cwt2f0
from speech_editing_tpu.utils.audio.pitch import denorm_f0, f0_to_coarse, norm_f0


class FastSpeech2Orig(FastSpeech):
    def setup(self):
        super().setup()
        hp = self.hp
        h = hp["hidden_size"]
        predictor_hidden = hp.get("predictor_hidden", -1)
        predictor_hidden = predictor_hidden if predictor_hidden > 0 else h
        if hp.get("use_energy_embed"):
            self.energy_embed = TokenEmbedding(300, h, padding_idx=0, onehot=True)
            self.energy_predictor = EnergyPredictor(
                n_chans=predictor_hidden, n_layers=hp.get("predictor_layers", 5),
                dropout_rate=hp.get("predictor_dropout", 0.2), odim=2,
                kernel_size=hp.get("predictor_kernel", 5))
        if hp.get("pitch_type") == "cwt" and hp.get("use_pitch_embed"):
            self.cwt_pitch_predictor = PitchPredictor(
                n_chans=predictor_hidden, n_layers=hp.get("predictor_layers", 5),
                dropout_rate=hp.get("predictor_dropout", 0.2), odim=11,
                kernel_size=hp.get("predictor_kernel", 5))
            self.cwt_stats_layers = [nn.Dense(h), nn.Dense(h), nn.Dense(2)]

    def __call__(self, txt_tokens, mel2ph=None, spk_embed=None, spk_id=None,
                 f0=None, uv=None, energy=None, infer=False, train=False, **kw):
        hp = self.hp
        ret: dict = {}
        encoder_out = self.encoder(txt_tokens, train=train)
        src_nonpadding = (txt_tokens > 0)[:, :, None].astype(encoder_out.dtype)
        style_embed = self.forward_style_embed(spk_embed, spk_id)

        dur_inp = (encoder_out + style_embed) * src_nonpadding
        mel2ph = self.forward_dur(dur_inp, None, mel2ph, txt_tokens, ret,
                                  use_pred_mel2ph=infer, train=train)
        tgt_nonpadding = (mel2ph > 0)[:, :, None].astype(encoder_out.dtype)
        decoder_inp = decoder_inp_ = expand_states(encoder_out, mel2ph)

        if hp.get("use_pitch_embed"):
            pitch_inp = (decoder_inp_ + style_embed) * tgt_nonpadding
            if hp.get("pitch_type") == "cwt":
                decoder_inp = decoder_inp + self.forward_cwt_pitch(
                    pitch_inp, f0, uv, mel2ph, ret, train=train)
            else:
                decoder_inp = decoder_inp + self.forward_pitch(
                    pitch_inp, None, f0, uv, mel2ph, ret,
                    use_pred_pitch=infer, train=train)
        if hp.get("use_energy_embed"):
            energy_inp = (decoder_inp_ + style_embed) * tgt_nonpadding
            decoder_inp = decoder_inp + self.forward_energy(
                energy_inp, energy, ret, train=train)

        decoder_inp = (decoder_inp + style_embed) * tgt_nonpadding
        ret["decoder_inp"] = decoder_inp
        x = self.decoder(decoder_inp, train=train)
        ret["mel_out"] = self.mel_out(x) * tgt_nonpadding
        return ret

    def forward_cwt_pitch(self, decoder_inp, f0, uv, mel2ph, ret,
                          train=False):
        hp = self.hp
        pitch_padding = mel2ph == 0
        decoder_inp = predictor_grad_scale(
            decoder_inp, hp.get("predictor_grad", 1.0))
        cwt_out = self.cwt_pitch_predictor(decoder_inp, train=train)
        ret["cwt"] = cwt_out
        stats_inp = decoder_inp.mean(axis=1)
        for i, layer in enumerate(self.cwt_stats_layers):
            stats_inp = layer(stats_inp)
            if i < len(self.cwt_stats_layers) - 1:
                stats_inp = jax.nn.relu(stats_inp)
        ret["f0_mean"] = mean = stats_inp[:, 0]
        ret["f0_std"] = std = stats_inp[:, 1]
        if f0 is None:  # inference: reconstruct f0 from the predicted CWT
            cwt_spec = cwt_out[:, :, :10]
            std = std * hp.get("cwt_std_scale", 0.8)
            f0 = norm_f0(cwt2f0(cwt_spec, mean, std), None)
            if hp.get("use_uv", True):
                uv = (cwt_out[:, :, -1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(f0, uv if hp.get("use_uv", True) else None,
                              pitch_padding=pitch_padding)
        ret["f0_denorm"] = f0_denorm
        return self.pitch_embed(f0_to_coarse(f0_denorm))

    def forward_energy(self, decoder_inp, energy, ret, train=False):
        decoder_inp = predictor_grad_scale(
            decoder_inp, self.hp.get("predictor_grad", 1.0))
        energy_pred = self.energy_predictor(decoder_inp, train=train)[:, :, 0]
        ret["energy_pred"] = energy_pred
        inp = energy_pred if energy is None else energy
        ids = jnp.clip((inp * 256 // 4).astype(jnp.int32), 0, 255)
        return self.energy_embed(ids)
