"""PortaSpeech: word-level linguistic encoder + VAE decoder (+ post-flow).

Parity surface:

* :class:`FVAE` — ``modules/tts/portaspeech/fvae.py``: strided conv
  encoder to a downsampled latent, WN posterior/decoder conditioned on the
  (equally strided) linguistic states, optional ResFlow-enhanced prior,
  KL against N(0,1);
* :class:`PortaSpeech` — ``modules/tts/portaspeech/portaspeech.py``:
  phone encoder + word-level pooling (group_hidden_by_segs), word-level
  duration, word-window attention expansion with dual sinusoidal position
  embeddings (intra-word position via the cumulative word-mask trick), VAE
  decoder over frames;
* :class:`PortaSpeechFlow` — ``portaspeech_flow.py``: adds a Glow post-flow
  over the mel conditioned on the decoder states (train: NLL; infer:
  sample + reverse).

TPU-first: the word-window attention mask is a static [T_mel, T_ph] mask
built from mel2word/ph2word; all pooling is segment_sum with static word
budgets; strided VAE uses Conv/ConvTranspose with SAME geometry.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.models.fs import StyleEmbedMixin
from speech_editing_tpu.modules.conv import ConvBlocks
from speech_editing_tpu.modules.flows import Glow, ResFlow
from speech_editing_tpu.modules.transformer import (FastSpeechEncoder,
                                                    FFTBlocks, TokenEmbedding)
from speech_editing_tpu.modules.predictors import DurationPredictor
from speech_editing_tpu.modules.wavenet import WN
from speech_editing_tpu.ops.seq_ops import (build_word_mask,
                                            clip_mel2token_to_multiple,
                                            expand_states,
                                            group_hidden_by_segs,
                                            length_regulator,
                                            predictor_grad_scale)


def sinusoidal_pos_emb(x: jax.Array, dim: int) -> jax.Array:
    """Continuous positions [B, T] -> [B, T, dim] (portaspeech.py:19-35)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    ang = x[:, :, None] * freqs[None, None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)


class FVAEEncoder(nn.Module):
    hidden_size: int
    c_latent: int
    kernel_size: int
    n_layers: int
    c_cond: int
    stride: int

    @nn.compact
    def __call__(self, x, nonpadding, cond, rng):
        s = self.stride
        x = nn.Conv(self.hidden_size, (2 * s,), strides=(s,),
                    padding=((s // 2, s - s // 2 - 1 + s),), name="pre")(x)
        t_sqz = nonpadding.shape[1] // s
        x = x[:, :t_sqz]
        np_sqz = nonpadding[:, ::s][:, :t_sqz]
        x = x * np_sqz
        x = WN(self.hidden_size, self.kernel_size, 1, self.n_layers,
               c_cond=self.c_cond, name="wn")(x, np_sqz, cond) * np_sqz
        out = nn.Dense(2 * self.c_latent, name="out_proj")(x)
        m, logs = out[..., : self.c_latent], out[..., self.c_latent:]
        z = m + jax.random.normal(rng, m.shape) * jnp.exp(logs)
        return z, m, logs, np_sqz


class FVAEDecoder(nn.Module):
    hidden_size: int
    out_channels: int
    kernel_size: int
    n_layers: int
    c_cond: int
    stride: int

    @nn.compact
    def __call__(self, z, nonpadding, cond):
        x = nn.ConvTranspose(self.hidden_size, (self.stride,),
                             strides=(self.stride,), name="pre")(z)
        x = x * nonpadding
        x = WN(self.hidden_size, self.kernel_size, 1, self.n_layers,
               c_cond=self.c_cond, name="wn")(x, nonpadding, cond) * nonpadding
        return nn.Dense(self.out_channels, name="out_proj")(x)


class FVAE(nn.Module):
    c_in_out: int
    hidden_size: int
    c_latent: int
    kernel_size: int
    enc_n_layers: int
    dec_n_layers: int
    c_cond: int
    stride: int
    use_prior_flow: bool
    flow_hidden: int = 64
    flow_kernel_size: int = 3
    flow_n_steps: int = 4

    def setup(self):
        s = self.stride
        self.g_pre_net = nn.Conv(self.c_cond, (2 * s,), strides=(s,),
                                 padding=((s // 2, s + s - s // 2 - 1),),
                                 name="g_pre_net")
        self.encoder = FVAEEncoder(self.hidden_size, self.c_latent,
                                   self.kernel_size, self.enc_n_layers,
                                   self.c_cond, s)
        self.decoder = FVAEDecoder(self.hidden_size, self.c_in_out,
                                   self.kernel_size, self.dec_n_layers,
                                   self.c_cond, s)
        if self.use_prior_flow:
            self.prior_flow = ResFlow(self.c_latent, self.flow_hidden,
                                      self.flow_kernel_size,
                                      self.flow_n_steps, c_cond=self.c_cond)

    def cond_sqz(self, cond, t_sqz):
        return self.g_pre_net(cond)[:, :t_sqz]

    def __call__(self, x, nonpadding, cond, rng, infer: bool = False,
                 noise_scale: float = 1.0):
        """x [B,T,80]; nonpadding [B,T,1]; cond [B,T,H]. Returns a dict."""
        t_sqz = nonpadding.shape[1] // self.stride
        g = self.cond_sqz(cond, t_sqz)
        if not infer:
            z_q, m_q, logs_q, np_sqz = self.encoder(x, nonpadding, g, rng)
            # KL( N(m_q, s_q) || prior )
            if self.use_prior_flow:
                logqx = (-0.5 * (np.log(2 * np.pi) + 2 * logs_q)
                         - 0.5 * ((z_q - m_q) / jnp.exp(logs_q)) ** 2)
                z_p = self.prior_flow(z_q, np_sqz, g)
                logpx = -0.5 * (np.log(2 * np.pi) + z_p ** 2)
                kl = (jnp.sum((logqx - logpx) * np_sqz)
                      / jnp.maximum(jnp.sum(np_sqz), 1.0) / logqx.shape[-1])
            else:
                kl_map = -logs_q - 0.5 + 0.5 * (jnp.exp(2 * logs_q) + m_q ** 2)
                kl = (jnp.sum(kl_map * np_sqz)
                      / jnp.maximum(jnp.sum(np_sqz), 1.0) / z_q.shape[-1])
                z_p = None
            return {"z_q": z_q, "kl": kl, "z_p": z_p, "m_q": m_q,
                    "logs_q": logs_q, "np_sqz": np_sqz, "g": g}
        z_p = jax.random.normal(
            rng, (g.shape[0], t_sqz, self.c_latent)) * noise_scale
        if self.use_prior_flow:
            np_sqz = nonpadding[:, ::self.stride][:, :t_sqz]
            z_p = self.prior_flow(z_p, np_sqz, g, reverse=True)
        return {"z_q": z_p, "g": g}


class PortaSpeech(StyleEmbedMixin, nn.Module):
    """ph_dict_size + word_dict_size linguistic encoder, FVAE frame decoder."""

    vocab_size: int
    word_dict_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        hp = self.hp
        h = hp["hidden_size"]
        self.hidden_size = h
        self.encoder = FastSpeechEncoder(
            self.vocab_size, h, hp["enc_layers"], hp["enc_ffn_kernel_size"],
            num_heads=hp["num_heads"])
        if hp.get("use_word_encoder", True):
            self.word_encoder = FastSpeechEncoder(
                self.word_dict_size, h, hp.get("word_enc_layers", 4),
                hp["enc_ffn_kernel_size"], num_heads=2)
        self.ph2word_encoder = FFTBlocks(
            h, hp.get("word_enc_layers", 4), 1, num_heads=hp["num_heads"])
        self.enc_pos_proj = nn.Dense(h)
        self.dec_res_proj = nn.Dense(h)
        self.attn_q = nn.Dense(h, use_bias=False)
        self.attn_k = nn.Dense(h, use_bias=False)
        self.attn_v = nn.Dense(h, use_bias=False)
        if hp.get("text_encoder_postnet", True):
            self.text_encoder_postnet = ConvBlocks(
                h, h, (1,) * 3, 5, layers_in_block=2)
        self.dur_predictor = DurationPredictor(
            n_chans=h, n_layers=hp["dur_predictor_layers"],
            dropout_rate=hp["predictor_dropout"],
            kernel_size=hp["dur_predictor_kernel"])
        self.fvae = FVAE(
            c_in_out=self.out_dims,
            hidden_size=hp.get("fvae_enc_dec_hidden", 192),
            c_latent=hp.get("latent_size", 16),
            kernel_size=hp.get("fvae_kernel_size", 5),
            enc_n_layers=hp.get("fvae_enc_n_layers", 8),
            dec_n_layers=hp.get("fvae_dec_n_layers", 4),
            c_cond=h, stride=hp.get("fvae_strides", 4),
            use_prior_flow=hp.get("use_prior_flow", True),
            flow_hidden=hp.get("prior_flow_hidden", 64),
            flow_kernel_size=hp.get("prior_flow_kernel_size", 3),
            flow_n_steps=hp.get("prior_flow_n_blocks", 4))
        if hp.get("use_pitch_embed"):
            self.pitch_embed = TokenEmbedding(300, h, onehot=True)
        if hp.get("use_spk_embed"):
            self.spk_embed_proj = nn.Dense(h)
        if hp.get("use_spk_id"):
            self.spk_id_proj = TokenEmbedding(hp["num_spk"], h, padding_idx=-1)
        if hp.get("add_word_pos", True):
            self.word_pos_proj = nn.Dense(h)

    def get_pos_embed(self, word2word, x2word):
        """Intra-word continuous position (portaspeech.py:214-218)."""
        x_pos = build_word_mask(word2word, x2word).astype(jnp.float32)
        x_pos = (jnp.cumsum(x_pos, -1)
                 / jnp.maximum(x_pos.sum(-1, keepdims=True), 1.0) * x_pos).sum(1)
        return sinusoidal_pos_emb(x_pos, self.hidden_size)

    def __call__(self, txt_tokens, word_tokens, ph2word, mel2word=None,
                 mel2ph=None, spk_embed=None, spk_id=None, pitch=None,
                 tgt_mels=None, infer: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False,
                 noise_scale: float = 0.8, global_step=None, **kw):
        """txt_tokens [B,S_ph]; word_tokens [B,S_w]; ph2word [B,S_ph];
        mel2word [B,T]."""
        hp = self.hp
        if rng is None:
            rng = self.make_rng("fvae")
        ret: dict = {}
        word_len = word_tokens.shape[1]
        style_embed = self.forward_style_embed(spk_embed, spk_id)

        src_nonpadding = (txt_tokens > 0)[:, :, None].astype(jnp.float32)
        ph_encoder_out = self.encoder(txt_tokens, train=train) * src_nonpadding
        ph_encoder_out = ph_encoder_out + style_embed
        word_encoder_out = 0.0
        if hp.get("use_word_encoder", True):
            word_encoder_out = self.word_encoder(word_tokens, train=train) + style_embed
            ph_encoder_out = ph_encoder_out + expand_states(
                word_encoder_out, ph2word)

        # word-level states: mean phone states per word + transformer
        h_word = group_hidden_by_segs(ph_encoder_out, ph2word, word_len)[0]
        h_word = self.ph2word_encoder(h_word, train=train)
        if hp.get("use_word_encoder", True):
            h_word = h_word + self.word_encoder(word_tokens, train=train)

        # word-level durations
        dur_inp = predictor_grad_scale(
            ph_encoder_out, hp.get("predictor_grad", 0.1))
        src_padding = txt_tokens == 0
        dur_ph = self.dur_predictor(dur_inp, src_padding, train=train)
        word_dur = jax.vmap(lambda w, v: jax.ops.segment_sum(
            v, w, num_segments=word_len + 1))(
            ph2word.astype(jnp.int32), dur_ph)[:, 1:]
        ret["dur"] = word_dur
        if mel2word is None:
            max_frames = int(hp.get("max_frames", 1548))
            word_padding = word_tokens == 0
            mel2word = jax.lax.stop_gradient(
                length_regulator(word_dur, max_frames, word_padding))
        mel2word = clip_mel2token_to_multiple(
            mel2word, hp.get("frames_multiple", 1))
        ret["mel2word"] = mel2word
        tgt_nonpadding = (mel2word > 0)[:, :, None].astype(jnp.float32)

        # word-window attention: queries = expanded word states + frame pos
        word2word = jnp.broadcast_to(
            jnp.arange(1, word_len + 1)[None, :], word_tokens.shape)
        enc_pos = self.get_pos_embed(word2word, ph2word)     # [B, S_ph, H]
        dec_pos = self.get_pos_embed(word2word, mel2word)    # [B, T, H]
        dec_word_mask = build_word_mask(mel2word, ph2word)   # [B, T, S_ph]
        ph_kv = self.enc_pos_proj(
            jnp.concatenate([ph_encoder_out, enc_pos], -1))
        word_exp = expand_states(h_word, mel2word)
        q_inp = self.dec_res_proj(jnp.concatenate([word_exp, dec_pos], -1))
        if hp.get("text_encoder_postnet", True):
            q_inp = self.text_encoder_postnet(q_inp, train=train)
        x_res = q_inp
        q = self.attn_q(q_inp)
        k = self.attn_k(ph_kv)
        v = self.attn_v(ph_kv)
        scores = jnp.einsum("bth,bsh->bts", q, k) / math.sqrt(self.hidden_size)
        scores = jnp.where(dec_word_mask > 0, scores, -1e9)
        weight = jax.nn.softmax(scores, -1)
        x = jnp.einsum("bts,bsh->bth", weight, v) + x_res
        ret["attn"] = weight
        if hp.get("add_word_pos", True):
            x = x + self.word_pos_proj(dec_pos)
        if hp.get("use_word_encoder", True):
            # post-attention word-state residual (reference
            # portaspeech.py:144-145): the expanded word states add into
            # the decoder input, not only into the attention query
            x = x + word_exp
        x = x * tgt_nonpadding
        if hp.get("use_pitch_embed") and pitch is not None:
            x = x + self.pitch_embed(pitch[:, : x.shape[1]])
        ret["decoder_inp"] = x
        ret["nonpadding"] = tgt_nonpadding

        # VAE decode
        if not infer:
            t = x.shape[1]
            tgt = tgt_mels[:, :t]
            k_vae, k_warm = jax.random.split(rng)
            fv = self.fvae(tgt, tgt_nonpadding, x, k_vae, infer=False)
            ret["kl"] = fv["kl"]
            z = fv["z_q"]
            pss = int(hp.get("posterior_start_steps", 0))
            if pss > 0 and global_step is not None:
                # early-training warm-up (reference run_decoder :178-180):
                # decode from noise until the posterior is trusted, which
                # prevents the decoder latching onto a collapsed posterior
                z = jnp.where(jnp.asarray(global_step) < pss,
                              jax.random.normal(k_warm, z.shape, z.dtype), z)
        else:
            fv = self.fvae(None, tgt_nonpadding, x, rng, infer=True,
                           noise_scale=noise_scale)
            z = fv["z_q"]
            ret["kl"] = 0.0
        x_recon = self.fvae.decoder(
            z, tgt_nonpadding, x) * tgt_nonpadding
        ret["mel_out_fvae"] = ret["mel_out"] = x_recon
        return ret


class PortaSpeechFlow(PortaSpeech):
    """PortaSpeech + Glow post-flow over the mel (portaspeech_flow.py):
    training adds the flow NLL of the ground-truth mel conditioned on
    [decoder states ; FVAE reconstruction]; inference samples the flow in
    reverse to sharpen the VAE output."""

    def setup(self):
        super().setup()
        hp = self.hp
        h = hp["hidden_size"]
        self.post_flow_cond_proj = nn.Dense(h)
        self.post_flow = Glow(
            self.out_dims, hp.get("post_glow_hidden", 128),
            hp.get("post_glow_kernel_size", 3),
            hp.get("post_glow_n_blocks", 8), n_layers=3, c_cond=h,
            sigmoid_scale=hp.get("sigmoid_scale", False))

    def __call__(self, txt_tokens, word_tokens, ph2word, mel2word=None,
                 mel2ph=None, spk_embed=None, spk_id=None, pitch=None,
                 tgt_mels=None, infer: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False,
                 noise_scale: float = 0.8, infer_post_glow: bool = True,
                 global_step=None, **kw):
        if rng is None:
            rng = self.make_rng("fvae")
        k_vae, k_flow = jax.random.split(rng)
        ret = super().__call__(
            txt_tokens, word_tokens, ph2word, mel2word, mel2ph, spk_embed,
            spk_id, pitch, tgt_mels, infer, k_vae, train, noise_scale,
            global_step=global_step)
        nonpadding = ret["nonpadding"]
        cond = self.post_flow_cond_proj(jnp.concatenate(
            [ret["decoder_inp"],
             jax.lax.stop_gradient(ret["mel_out_fvae"])], -1))
        if not infer:
            tgt = tgt_mels[:, : nonpadding.shape[1]]
            z, logdet = self.post_flow(tgt, nonpadding, cond)
            logp = jnp.sum(
                -0.5 * (z ** 2 + np.log(2 * np.pi)) * nonpadding, axis=(1, 2))
            denom = jnp.maximum(
                jnp.sum(nonpadding, axis=(1, 2)) * self.out_dims, 1.0)
            ret["postflow_nll"] = jnp.mean(-(logp + logdet) / denom)
        elif infer_post_glow:
            z = jax.random.normal(
                k_flow, (cond.shape[0], cond.shape[1], self.out_dims))
            z = z * self.hp.get("noise_scale", 0.8)
            mel, _ = self.post_flow(z, nonpadding, cond, reverse=True)
            ret["mel_out"] = mel * nonpadding
        return ret
