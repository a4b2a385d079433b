"""CampNet: coarse/fine context-aware mask prediction (flax.linen).

Capability parity: ``modules/speech_editing/campnet/campnet.py`` (ICASSP'22
CampNet) — 3-layer text transformer encoder; learned ``mask_emb`` replacing
masked mel frames (:34,58); 6-layer cross-attending coarse decoder (:60-62);
residual ConvBlocks fine decoder over the coarse-composited mel (:64-69).
Returns mel_out_coarse / mel_out_fine / attn.

TPU-first: feature-last [B, T, 80] throughout; the coarse+fine pipeline is
one flat conv/attention graph under jit (no NCL transposes, no module
deletion gymnastics — this is a standalone module, not a FastSpeech
subclass with deleted children).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.modules.conv import ConvBlocks
from speech_editing_tpu.modules.predictors import MelEncoder
from speech_editing_tpu.modules.transformer import (TransformerDecoder,
                                                    TransformerEncoder)


class CampNet(nn.Module):
    vocab_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        h = self.hp["hidden_size"]
        self.hidden_size = h
        self.encoder = TransformerEncoder(
            self.vocab_size, h, num_layers=3,
            ffn_kernel_size=self.hp["dec_ffn_kernel_size"], num_heads=2)
        self.mel_encoder = MelEncoder(hidden_size=h)
        self.decoder_coarse = TransformerDecoder(
            h, num_layers=6, ffn_kernel_size=self.hp["dec_ffn_kernel_size"],
            num_heads=2)
        self.decoder_fine = ConvBlocks(
            h, h, (1,) * 5, kernel_size=5,
            layers_in_block=2, norm_type=self.hp.get("enc_dec_norm", "ln"))
        self.mel_out_coarse = nn.Dense(self.out_dims, use_bias=False)
        self.mel_out_fine = nn.Dense(self.out_dims, use_bias=False)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.zeros, (1, 1, self.out_dims))

    def __call__(self, txt_tokens, mels, time_mel_masks,
                 spk_embed=None, spk_id=None, infer: bool = False,
                 train: bool = False, **kw):
        """txt_tokens [B,S]; mels [B,T,80]; time_mel_masks [B,T,1]."""
        ret: dict = {}
        src_nonpadding = (txt_tokens > 0).astype(mels.dtype)[:, :, None]
        encoder_out = self.encoder(txt_tokens, train=train) * src_nonpadding

        mel_nonpadding = (jnp.abs(mels).sum(-1) > 0
                          ).astype(mels.dtype)[:, :, None]
        # coarse: masked frames replaced by the learned mask embedding
        mel_input_coarse = mels * (1 - time_mel_masks) + self.mask_emb * time_mel_masks
        mel_input_coarse = self.mel_encoder(mel_input_coarse) * mel_nonpadding
        # Mask padded frames at the self-attention KEYS too. The reference
        # decoder masks only values
        # (speech_editing/commons/transformer.py:780-801), so zero-valued
        # padded keys still soak softmax mass out of real keys — harmless
        # when train and inference share the same padding, but it breaks the
        # batched server's bucket-padding-inertness contract (measured up to
        # 0.98 max-abs on real frames). Documented reference-bug fix;
        # hp['ref_pad_compat'] restores value-only masking for padded-input
        # torch-parity checks (exact-fit outputs are identical either way:
        # the key mask is all-False then).
        frame_pad = mel_nonpadding[..., 0] == 0
        coarse_h, attn = self.decoder_coarse(
            mel_input_coarse, encoder_out,
            encoder_padding_mask=(txt_tokens == 0),
            self_attn_padding_mask=(None if self.hp.get("ref_pad_compat")
                                    else frame_pad),
            padding_mask=frame_pad, train=train)
        mel_out_coarse = self.mel_out_coarse(coarse_h * mel_nonpadding) * mel_nonpadding

        # fine: residual refinement over the coarse-composited mel;
        # the composite stops gradients flowing twice into the coarse stack
        mel_coarse = mels * (1 - time_mel_masks) + mel_out_coarse * time_mel_masks
        mel_input_fine = self.mel_encoder(mel_coarse) * mel_nonpadding
        mel_out_fine = self.decoder_fine(mel_input_fine, train=train) * mel_nonpadding
        mel_out_fine = self.mel_out_fine(mel_out_fine) * mel_nonpadding
        mel_out_fine = mel_coarse + mel_out_fine * time_mel_masks

        ret["mel_out_coarse"] = mel_out_coarse
        ret["mel_out_fine"] = mel_out_fine
        ret["attn"] = attn
        return ret
