"""FastSpeech acoustic model / masked conditioner (flax.linen).

Two roles, mirroring the reference:

* :class:`FastSpeech` — the plain NAR TTS baseline (``modules/tts/fs.py``),
  used standalone and with ``skip_decoder=True`` as the conditioner base of
  every editing model.
* masked-conditioning mode (``time_mel_masks`` given) — the FluentSpeech
  variant (``modules/speech_editing/spec_denoiser/fs.py``): the duration
  predictor sees an embedding of the *masked ground-truth durations*
  (fs.py:123-151) and the pitch predictor an embedding of the *masked
  ground-truth coarse pitch* (fs.py:153-189), so unedited regions anchor the
  predictions and only the masked span is inpainted.

All control flow is static: ``infer/use_pred_mel2ph/use_pred_pitch`` are
Python bools resolved at trace time; sequence dims come from the (bucketed)
input shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.modules.conv import ConvBlocks, TextConvEncoder
from speech_editing_tpu.modules.predictors import DurationPredictor, PitchPredictor
from speech_editing_tpu.modules.transformer import (FastSpeechDecoder,
                                                    FastSpeechEncoder,
                                                    TokenEmbedding)
from speech_editing_tpu.modules.wavenet import WN
from speech_editing_tpu.ops.seq_ops import (clip_mel2token_to_multiple,
                                            expand_states, length_regulator,
                                            mel2token_to_dur,
                                            predictor_grad_scale)
from speech_editing_tpu.utils.audio.pitch import denorm_f0, f0_to_coarse


class StyleEmbedMixin:
    """Shared speaker-style projection: requires ``hp`` plus
    ``spk_embed_proj``/``spk_id_proj`` submodules on the host module
    (reference fs.py:114-121; also used verbatim by PortaSpeech)."""

    def forward_style_embed(self, spk_embed=None, spk_id=None):
        style = 0.0
        if self.hp.get("use_spk_embed") and spk_embed is not None:
            style = style + self.spk_embed_proj(spk_embed)[:, None, :]
        if self.hp.get("use_spk_id") and spk_id is not None:
            style = style + self.spk_id_proj(spk_id)[:, None, :]
        return style


class FastSpeech(StyleEmbedMixin, nn.Module):
    """hp: an HParams/dict with the reference's config keys."""

    vocab_size: int
    hp: Any
    out_dims: Optional[int] = None

    def setup(self):
        hp = self.hp
        h = hp["hidden_size"]
        self.hidden_size = h
        enc_type = hp.get("encoder_type", "fft")
        if enc_type == "fft":
            self.encoder = FastSpeechEncoder(
                self.vocab_size, h, hp["enc_layers"], hp["enc_ffn_kernel_size"],
                num_heads=hp["num_heads"],
                remat=bool(hp.get("remat_fft", False)))
        elif enc_type == "conv":
            self.encoder = TextConvEncoder(
                self.vocab_size, h, h, tuple(hp["enc_dilations"]), hp["enc_kernel_size"],
                norm_type=hp.get("enc_dec_norm", "ln"),
                layers_in_block=hp.get("layers_in_block", 2),
                post_net_kernel=hp.get("enc_post_net_kernel", 3))
        elif enc_type == "rel_fft":
            from speech_editing_tpu.modules.rel_transformer import \
                RelTransformerEncoder
            self.encoder = RelTransformerEncoder(
                self.vocab_size, h, hp["enc_layers"],
                hp.get("enc_ffn_kernel_size", 3), hp["num_heads"],
                dropout=hp.get("dropout", 0.0),
                prenet=hp.get("enc_prenet", True))
        elif enc_type == "tacotron":
            from speech_editing_tpu.modules.rnn import TacotronEncoder
            self.encoder = TacotronEncoder(self.vocab_size, h)
        elif enc_type == "tacotron2":
            from speech_editing_tpu.modules.rnn import RNNEncoder
            self.encoder = RNNEncoder(self.vocab_size, h)
        else:
            raise NotImplementedError(f"encoder_type={enc_type}")

        dec_type = hp.get("decoder_type", "fft")
        if dec_type == "fft":
            self.decoder = FastSpeechDecoder(
                h, hp["dec_layers"], hp["dec_ffn_kernel_size"], hp["num_heads"],
                remat=bool(hp.get("remat_fft", False)))
        elif dec_type == "conv":
            self.decoder = ConvBlocks(
                h, h, tuple(hp["dec_dilations"]), hp["dec_kernel_size"],
                norm_type=hp.get("enc_dec_norm", "ln"),
                layers_in_block=hp.get("layers_in_block", 2),
                dropout=hp.get("dropout", 0.0),
                post_net_kernel=hp.get("dec_post_net_kernel", 3))
        elif dec_type == "wn":
            self.decoder = WN(h, kernel_size=5, dilation_rate=1,
                              n_layers=hp["dec_layers"])
        elif dec_type == "rnn":
            from speech_editing_tpu.modules.rnn import DecoderRNN
            self.decoder = DecoderRNN(h)
        else:
            raise NotImplementedError(f"decoder_type={dec_type}")

        self.mel_out = nn.Dense(self.out_dims or hp["audio_num_mel_bins"],
                                name="mel_out_proj")
        if hp.get("use_spk_id"):
            self.spk_id_proj = TokenEmbedding(hp["num_spk"], h, padding_idx=-1)
        if hp.get("use_spk_embed"):
            self.spk_embed_proj = nn.Dense(h, name="spk_embed_proj")

        predictor_hidden = hp.get("predictor_hidden", -1)
        predictor_hidden = predictor_hidden if predictor_hidden > 0 else h
        self.dur_embed = TokenEmbedding(2000, h)
        self.dur_predictor = DurationPredictor(
            n_chans=predictor_hidden,
            n_layers=hp["dur_predictor_layers"],
            dropout_rate=hp["predictor_dropout"],
            kernel_size=hp["dur_predictor_kernel"])
        if hp.get("use_pitch_embed"):
            self.pitch_embed = TokenEmbedding(300, h, onehot=True)
            self.pitch_predictor = PitchPredictor(
                n_chans=predictor_hidden, n_layers=5, dropout_rate=0.2,
                odim=2, kernel_size=hp["predictor_kernel"])

    # -- sub-forwards --------------------------------------------------------

    def forward_dur(self, dur_inp, time_mel_masks, mel2ph, txt_tokens, ret,
                    masked_dur=None, use_pred_mel2ph=False, train=False):
        hp = self.hp
        if time_mel_masks is not None:
            # condition the predictor on the durations of *unmasked* frames
            if masked_dur is None:
                T_txt = txt_tokens.shape[1]
                nonpadding = (txt_tokens != 0)
                masked_dur = mel2token_to_dur(
                    (mel2ph * (1 - time_mel_masks[..., 0])).astype(jnp.int32),
                    T_txt) * nonpadding
            dur_inp = dur_inp + self.dur_embed(masked_dur.astype(jnp.int32))
        src_padding = txt_tokens == 0
        dur_inp = predictor_grad_scale(dur_inp, hp.get("predictor_grad", 1.0))
        dur = self.dur_predictor(dur_inp, src_padding, train=train)
        ret["dur"] = dur
        if use_pred_mel2ph:
            # pure-TTS inference has no reference mel2ph: regulate to the
            # static frame budget (XLA needs a fixed length; masks downstream)
            max_frames = (mel2ph.shape[1] if mel2ph is not None
                          else int(hp.get("max_frames", 1548)))
            mel2ph = jax.lax.stop_gradient(
                length_regulator(dur, max_frames, src_padding))
        mel2ph = clip_mel2token_to_multiple(mel2ph, hp.get("frames_multiple", 1))
        ret["mel2ph"] = mel2ph
        return mel2ph

    def forward_pitch(self, decoder_inp, time_mel_masks, f0, uv, mel2ph, ret,
                      use_pred_pitch=False, train=False):
        hp = self.hp
        if f0 is None:  # free-running TTS: everything comes from the predictor
            f0 = jnp.zeros(mel2ph.shape, decoder_inp.dtype)
        if uv is None:
            uv = jnp.zeros(mel2ph.shape, decoder_inp.dtype)
        pitch_padding = mel2ph == 0
        use_uv = hp.get("pitch_type", "frame") == "frame" and hp.get("use_uv", True)
        pitch_inp = decoder_inp
        if time_mel_masks is not None:
            tm = time_mel_masks[..., 0]
            masked_f0 = f0 * (1 - tm)
            masked_uv = uv * (1 - tm)
            masked_gt_f0 = denorm_f0(masked_f0, masked_uv if use_uv else None,
                                     pitch_padding=pitch_padding)
            pitch_inp = pitch_inp + self.pitch_embed(f0_to_coarse(masked_gt_f0))
        pitch_inp = predictor_grad_scale(pitch_inp, hp.get("predictor_grad", 1.0))
        # per-layer padding re-mask (no-op at exact fit) so frame-bucket
        # padding can't leak through the predictor convs; ref_pad_compat
        # reproduces the reference's unmasked predictor for padded-input
        # torch-parity checks (nar_tts_modules.py:75-100)
        pp_mask = None if hp.get("ref_pad_compat") else pitch_padding
        pitch_pred = self.pitch_predictor(pitch_inp, x_padding=pp_mask,
                                          train=train)
        ret["pitch_pred"] = pitch_pred
        if use_pred_pitch:
            tm = time_mel_masks[..., 0] if time_mel_masks is not None else 1.0
            pred_f0 = pitch_pred[:, :, 0]
            pred_uv = (pitch_pred[:, :, 1] > 0).astype(uv.dtype)
            res_f0 = f0 * (1 - tm) + pred_f0 * tm
            res_uv = uv * (1 - tm) + pred_uv * tm if use_uv else uv
            pitch_padding_eff = None
        else:
            res_f0, res_uv = f0, uv
            pitch_padding_eff = pitch_padding
        f0_denorm = denorm_f0(res_f0, res_uv if use_uv else None,
                              pitch_padding=pitch_padding_eff)
        ret["f0_denorm"] = f0_denorm
        ret["f0_denorm_pred"] = denorm_f0(
            pitch_pred[:, :, 0],
            (pitch_pred[:, :, 1] > 0) if use_uv else None,
            pitch_padding=pitch_padding_eff)
        return self.pitch_embed(f0_to_coarse(f0_denorm))

    # -- main ----------------------------------------------------------------

    def __call__(self, txt_tokens, time_mel_masks=None, mel2ph=None,
                 spk_embed=None, f0=None, uv=None, energy=None, spk_id=None,
                 skip_decoder=False, infer=False, use_pred_mel2ph=False,
                 use_pred_pitch=False, masked_dur=None, train=False, **kw):
        """txt_tokens [B,S]; time_mel_masks [B,T,1]; mel2ph [B,T]; f0/uv [B,T]."""
        ret = {}
        encoder_out = self.encoder(txt_tokens, train=train)
        src_nonpadding = (txt_tokens > 0)[:, :, None].astype(encoder_out.dtype)
        style_embed = self.forward_style_embed(spk_embed, spk_id)

        dur_inp = (encoder_out + style_embed) * src_nonpadding
        mel2ph = self.forward_dur(dur_inp, time_mel_masks, mel2ph, txt_tokens,
                                  ret, masked_dur=masked_dur,
                                  use_pred_mel2ph=use_pred_mel2ph, train=train)
        tgt_nonpadding = (mel2ph > 0)[:, :, None].astype(encoder_out.dtype)
        decoder_inp = expand_states(encoder_out, mel2ph)

        if self.hp.get("use_pitch_embed"):
            pitch_inp = (decoder_inp + style_embed) * tgt_nonpadding
            decoder_inp = decoder_inp + self.forward_pitch(
                pitch_inp, time_mel_masks, f0, uv, mel2ph, ret,
                use_pred_pitch=use_pred_pitch, train=train)

        decoder_inp = (decoder_inp + style_embed) * tgt_nonpadding
        ret["decoder_inp"] = decoder_inp
        if skip_decoder:
            return ret
        x = self.decoder(decoder_inp, train=train)
        ret["mel_out"] = self.mel_out(x) * tgt_nonpadding
        return ret
