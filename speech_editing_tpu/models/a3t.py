"""A3T: alignment-aware acoustic/text joint conformer (flax.linen).

Capability parity: ``modules/speech_editing/a3t/`` (ICML'22 A3T) —
joint encoding of [masked-mel-embedding | text-embedding] concatenated along
time with **mel2ph segment embeddings** tying mel frames to their phones
(a3t_conformer.py:64-101); 4-layer conformer encoder (k=9) + 4-layer
conformer decoder (k=31) over the concatenated sequence, truncated back to
the mel length (a3t.py:58); Tacotron-style 5-conv Postnet residual refining
the composited mel (a3t.py:61-64, a3t_postnet.py:16-113, n_chans=256,
bias-free convs).

Faithful reference numerics (checkpoint-conversion parity, VERDICT r2 #2):
features are scaled by sqrt(H) (espnet RelPositionalEncoding xscale), the
rel-pos table rows are the reference's reversed-5000 slices, the per-segment
position embeddings restart at the mel/text boundary and are zeroed at
padding, and masking happens only at attention keys + stack output.

Norms: training uses LayerNorm where the reference has BatchNorm1d
(running stats are mutable state that breaks pure pjit steps); converted
torch checkpoints set ``hp['espnet_bn_affine']=True`` to build per-channel
affine norms that the converter fills with folded eval-mode BN.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.modules.conformer import (ConformerLayers,
                                                  espnet_rel_pos_emb)
from speech_editing_tpu.modules.predictors import MelEncoder
from speech_editing_tpu.modules.transformer import TokenEmbedding


class Postnet(nn.Module):
    """5-conv residual postnet (a3t_postnet.py:16-113): bias-free convs,
    norm (BN in the reference; 'ln'/'affine' here) + tanh on the first
    n-1 layers, norm only on the last; dropout_rate defaults to 0."""

    odim: int = 80
    n_layers: int = 5
    n_chans: int = 256
    kernel_size: int = 5
    dropout: float = 0.0
    norm_type: str = "ln"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 nonpadding=None) -> jax.Array:
        """nonpadding [B,T] (pad-safe serving): re-mask after every layer —
        without it, norm(0)=bias rows at padded frames feed the next conv
        and leak into real frames within the kernel radius. None keeps the
        reference behavior (no internal masking)."""
        from speech_editing_tpu.modules.conformer import _norm

        def remask(y):
            return y if nonpadding is None else y * nonpadding[:, :, None]

        for i in range(self.n_layers - 1):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        use_bias=False, name=f"conv_{i}")(remask(x))
            x = _norm(self.norm_type, f"norm_{i}")(x)
            x = jnp.tanh(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.odim, (self.kernel_size,), padding="SAME",
                    use_bias=False,
                    name=f"conv_{self.n_layers - 1}")(remask(x))
        x = _norm(self.norm_type, f"norm_{self.n_layers - 1}")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class A3T(nn.Module):
    vocab_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        h = self.hp["hidden_size"]
        norm_type = ("affine" if self.hp.get("espnet_bn_affine")
                     else "ln")
        self.hidden_size = h
        # pad-safe serving (hp['serve_pad_safe_a3t'], default off — see
        # __call__ docstring): adds no parameters, so checkpoints are
        # interchangeable between the two modes
        self.pad_safe = bool(self.hp.get("serve_pad_safe_a3t", False))
        self.txt_embed = TokenEmbedding(self.vocab_size, h, padding_idx=0)
        self.mel_embed = MelEncoder(hidden_size=h)
        self.seg_embed = TokenEmbedding(2000, h, padding_idx=0)
        self.encoder = ConformerLayers(h, num_layers=4, kernel_size=9,
                                       norm_type=norm_type,
                                       pad_safe=self.pad_safe)
        self.a3t_decoder = ConformerLayers(h, num_layers=4, kernel_size=31,
                                           norm_type=norm_type,
                                           pad_safe=self.pad_safe)
        self.a3t_postnet = Postnet(odim=self.out_dims, norm_type=norm_type)
        self.mel_out_decoder = nn.Dense(self.out_dims)

    def __call__(self, txt_tokens, mels, mel2ph, time_mel_masks,
                 spk_embed=None, spk_id=None, infer: bool = False,
                 train: bool = False, **kw):
        """txt_tokens [B,S]; mels [B,T,80]; mel2ph [B,T];
        time_mel_masks [B,T,1]."""
        ret: dict = {}
        h = self.hidden_size
        xscale = math.sqrt(h)  # espnet RelPositionalEncoding xscale
        txt_nonpadding = (txt_tokens > 0).astype(mels.dtype)
        mel_nonpadding = (mel2ph > 0).astype(mels.dtype)
        t_mel, s_txt = mels.shape[1], txt_tokens.shape[1]

        # text side: embedding (scaled) + identity segment ids (ph i -> i+1)
        ph2ph = jnp.arange(1, s_txt + 1)[None, :]
        ph2ph = jnp.broadcast_to(ph2ph, txt_tokens.shape)
        txt_feat = self.txt_embed(txt_tokens) * txt_nonpadding[:, :, None]
        txt_feat = txt_feat * xscale + self.seg_embed(ph2ph)

        # mel side: masked-mel embedding (scaled) + mel2ph segment ids
        mel_feat = self.mel_embed(
            mels * (1 - time_mel_masks)) * mel_nonpadding[:, :, None]
        mel_feat = mel_feat * xscale + self.seg_embed(mel2ph.astype(jnp.int32))

        x = jnp.concatenate([mel_feat, txt_feat], axis=1)
        nonpadding = jnp.concatenate([mel_nonpadding, txt_nonpadding], axis=1)
        x = x * nonpadding[:, :, None]
        # per-segment position rows (restart at the mel/text boundary),
        # zeroed at padding — reference a3t_conformer.py:72-78
        pe_mel = jnp.asarray(espnet_rel_pos_emb(t_mel, h))
        pe_txt = jnp.asarray(espnet_rel_pos_emb(s_txt, h))
        pos_emb = jnp.concatenate([pe_mel, pe_txt], axis=0)[None]
        pos_emb = pos_emb * nonpadding[:, :, None]

        if self.pad_safe:
            # pad-safe serving (hp['serve_pad_safe_a3t']): compact each
            # row's valid positions to the front — [mel 0..T_i | text
            # 0..S_i | padding] — so frame/token-bucket padding no longer
            # sits BETWEEN the segments shifting mel<->text relative
            # distances; pos rows travel with their tokens (per-segment
            # restart indices are preserved), the conformer conv masks
            # padded lanes, and attention evaluates the legacy rel-shift
            # at each row's true length (modules/conformer.py). Valid mel
            # positions are a prefix, so the gather is the identity there
            # and the [:, :t_mel] truncation below still addresses them.
            # At exact fit every gather is the identity and every mask is
            # ones: the flag is a no-op (asserted in tests/test_serving.py).
            order = jnp.argsort((nonpadding <= 0).astype(jnp.int32), axis=1,
                                stable=True)
            x = jnp.take_along_axis(x, order[:, :, None], axis=1)
            pos_emb = jnp.take_along_axis(
                jnp.broadcast_to(pos_emb, x.shape), order[:, :, None], axis=1)
            nonpadding = jnp.take_along_axis(nonpadding, order, axis=1)

        enc = self.encoder(x, pos_emb, nonpadding=nonpadding, train=train)
        dec = self.a3t_decoder(enc, pos_emb, nonpadding=nonpadding,
                               train=train)
        dec = dec[:, :t_mel] * mel_nonpadding[:, :, None]
        mel_out_decoder = self.mel_out_decoder(dec) * mel_nonpadding[:, :, None]

        mel_decoder = mels * (1 - time_mel_masks) + mel_out_decoder * time_mel_masks
        post_in = self.mel_embed(mel_decoder) * mel_nonpadding[:, :, None]
        mel_out_postnet = self.a3t_postnet(
            post_in, train=train,
            nonpadding=mel_nonpadding if self.pad_safe else None
        ) * mel_nonpadding[:, :, None]
        mel_out_postnet = mel_decoder + mel_out_postnet * time_mel_masks

        ret["mel_out_decoder"] = mel_out_decoder
        ret["mel_out_postnet"] = mel_out_postnet
        return ret
