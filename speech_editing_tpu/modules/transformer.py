"""Transformer/FFT building blocks (flax.linen).

Capability parity with the reference FastSpeech stack
(``modules/commons/transformer.py``: SinusoidalPositionalEmbedding :14,
TransformerFFNLayer :76, MultiheadAttention :138, EncSALayer :489,
DecSALayer :532, FFTBlocks :653, FastSpeechEncoder :710) and the editing
models' cross-attention decoder
(``modules/speech_editing/commons/transformer.py:750-811``).

TPU-first design notes:
* everything stays ``[B, T, C]`` (no T-major transposes — the lane dim is C);
* attention is one fused einsum pair per layer; padding enters as an additive
  bias so XLA fuses it into the softmax;
* no incremental-state machinery — all models here are non-autoregressive,
  and the reference never uses the incremental path in the editing stack.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.ops.seq_ops import make_positions

DEFAULT_MAX_POSITIONS = 2000
NEG_INF = -1e9


def embed_init(dim: int):
    return nn.initializers.normal(stddev=dim ** -0.5)


class TokenEmbedding(nn.Module):
    """Embedding with zeroed padding id (reference layers.py:45).

    ``onehot=True`` computes the lookup as one_hot @ table: identical
    values (0/1 matmul is exact) but the backward becomes a matmul instead
    of a scatter-add — ~25x faster on TPU for frame-rate lookups into
    small tables (pitch/energy coarse bins). Param layout is unchanged.
    """

    vocab_size: int
    dim: int
    padding_idx: int = 0
    onehot: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        embed = nn.Embed(self.vocab_size, self.dim,
                         embedding_init=embed_init(self.dim), name="embed")
        if self.onehot:
            table = embed.embedding
            oh = jax.nn.one_hot(tokens, self.vocab_size, dtype=table.dtype)
            # HIGHEST: keep the 0/1 matmul exact for f32 tables
            emb = jax.lax.dot_general(
                oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        else:
            emb = embed(tokens)
        return emb * (tokens != self.padding_idx)[..., None]


def sinusoidal_embedding_table(num_positions: int, dim: int,
                               padding_idx: int | None = 0) -> np.ndarray:
    """tensor2tensor layout: [sin(all) | cos(all)] concatenated (not interleaved)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0
    return table.astype(np.float32)


def sinusoidal_positional_embedding(tokens_or_positions: jax.Array, dim: int,
                                    positions: jax.Array | None = None,
                                    padding_idx: int = 0) -> jax.Array:
    """Padding-aware sinusoidal pos-emb of a [B, T] id tensor."""
    if positions is None:
        positions = make_positions(tokens_or_positions, padding_idx)
    max_pos = padding_idx + 1 + positions.shape[1]
    # (table is an f32 host constant; callers add the result to activations
    # that may be bf16 — cast at the add site to avoid promoting them)
    table = jnp.asarray(sinusoidal_embedding_table(max_pos, dim, padding_idx))
    return jax.lax.stop_gradient(table[positions])


class MultiheadAttention(nn.Module):
    """Softmax MHA with key-padding bias; optionally returns attn weights."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array,
                 key_padding_mask: Optional[jax.Array] = None,
                 attn_mask: Optional[jax.Array] = None,
                 train: bool = False,
                 return_weights: bool = False):
        h, d = self.num_heads, self.dim // self.num_heads
        dense = lambda name: nn.DenseGeneral((h, d), use_bias=self.bias, name=name)
        q = dense("q_proj")(query) * d ** -0.5  # [B, Tq, h, d]
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        # Blockwise (flash) kernel path: avoids materializing [B,h,Tq,Tk]
        # logits/probs in HBM. Engages only when nothing needs the full
        # probability tensor (no custom additive mask, no attention dropout,
        # no weight readout) — everywhere in the editing/TTS stacks.
        from speech_editing_tpu.ops.flash_attention import (flash_enabled,
                                                            flash_mha)
        if (flash_enabled() and attn_mask is None and not return_weights
                and (self.dropout == 0 or not train)):
            out = flash_mha(q, k, v, key_padding_mask=key_padding_mask)
            return nn.DenseGeneral(self.dim, axis=(-2, -1),
                                   use_bias=self.bias, name="out_proj")(out)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            logits = logits + jnp.where(key_padding_mask, NEG_INF, 0.0)[:, None, None, :]
        if attn_mask is not None:
            logits = logits + attn_mask
        weights = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0:
            weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
        out = nn.DenseGeneral(self.dim, axis=(-2, -1), use_bias=self.bias,
                              name="out_proj")(out)
        if return_weights:
            return out, weights
        return out


class ConvFFN(nn.Module):
    """FFN with a kernel-size-k conv up-projection (reference FFNLayer :76).

    ``padding='SAME'`` for encoders, ``'LEFT'`` (causal) for decoder layers.
    Output of the conv is scaled by k^-0.5 as in the reference.
    """

    hidden_size: int
    filter_size: int
    kernel_size: int = 1
    padding: str = "SAME"
    dropout: float = 0.0
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.padding == "LEFT":
            pad = [(self.kernel_size - 1, 0)]
        else:
            k = self.kernel_size
            pad = [((k - 1) // 2, k // 2)] if k % 2 == 0 else [(k // 2, k // 2)]
        x = nn.Conv(self.filter_size, (self.kernel_size,), padding=pad, name="ffn_1")(x)
        x = x * self.kernel_size ** -0.5
        x = jax.nn.gelu(x, approximate=False) if self.act == "gelu" else jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.hidden_size, name="ffn_2")(x)


class EncSALayer(nn.Module):
    """Pre-LN self-attention + conv-FFN encoder layer (reference :489)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    relu_dropout: float = 0.0
    kernel_size: int = 9
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: jax.Array,
                 attn_mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        nonpad = (~padding_mask)[:, :, None].astype(x.dtype)
        if self.num_heads > 0:
            res = x
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
            x = MultiheadAttention(self.dim, self.num_heads,
                                   dropout=self.attention_dropout,
                                   name="self_attn")(
                x, x, x, key_padding_mask=padding_mask, attn_mask=attn_mask,
                train=train)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = (res + x) * nonpad
        res = x
        # mask the LN output before the k-wide FFN conv: trained LN bias
        # makes padded rows nonzero (LN(0)=β) and the SAME conv would leak
        # them into real frames — masking reproduces exact-fit numerics at
        # padded buckets (no-op at exact fit and at torch init where β=0)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x) * nonpad
        x = ConvFFN(self.dim, 4 * self.dim, self.kernel_size, "SAME",
                    self.relu_dropout, self.act, name="ffn")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return (res + x) * nonpad


class DecSALayer(nn.Module):
    """Self-attn + cross-attn + causal conv-FFN layer (reference :532)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    relu_dropout: float = 0.0
    kernel_size: int = 9
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, encoder_out=None, encoder_padding_mask=None,
                 self_attn_padding_mask=None, self_attn_mask=None,
                 train: bool = False):
        res = x
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        h = MultiheadAttention(self.dim, self.num_heads,
                               dropout=self.attention_dropout, name="self_attn")(
            h, h, h, key_padding_mask=self_attn_padding_mask,
            attn_mask=self_attn_mask, train=train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = res + h

        attn_weights = None
        if encoder_out is not None:
            res = x
            h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
            h, attn_weights = MultiheadAttention(
                self.dim, self.num_heads, dropout=self.attention_dropout,
                name="encoder_attn")(
                h, encoder_out, encoder_out,
                key_padding_mask=encoder_padding_mask, train=train,
                return_weights=True)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = res + h

        res = x
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm3")(x)
        h = ConvFFN(self.dim, 4 * self.dim, self.kernel_size, "LEFT",
                    self.relu_dropout, self.act, name="ffn")(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return res + h, attn_weights


class FFTBlocks(nn.Module):
    """Stack of EncSALayers with optional learned-alpha pos-emb (ref :653)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    dropout: float = 0.0
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    use_pos_embed_alpha: bool = True
    remat: bool = False  # rematerialize layers in the bwd pass: the frame-
    # rate FFT stacks are HBM-roofline-bound (measured ~800 GB/s), so
    # recomputing activations beats storing/reloading them

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: Optional[jax.Array] = None,
                 attn_mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        if padding_mask is None:
            padding_mask = jnp.abs(x).sum(-1) == 0
        nonpad = (~padding_mask)[:, :, None].astype(x.dtype)
        if self.use_pos_embed:
            alpha = (self.param("pos_embed_alpha", nn.initializers.ones, (1,))
                     if self.use_pos_embed_alpha else 1.0)
            pos_ids = (~padding_mask).astype(jnp.int32)
            positions = sinusoidal_positional_embedding(
                pos_ids, self.hidden_size).astype(x.dtype)
            x = x + alpha * positions
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x * nonpad

        def body(layer, x):
            return layer(x, padding_mask, attn_mask, train) * nonpad

        if self.remat:
            body = nn.remat(body, prevent_cse=False)
        for i in range(self.num_layers):
            x = body(EncSALayer(self.hidden_size, self.num_heads,
                                dropout=self.dropout, attention_dropout=0.0,
                                relu_dropout=self.dropout,
                                kernel_size=self.ffn_kernel_size,
                                name=f"layers_{i}"), x)
        if self.use_last_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x) * nonpad
        return x


class FastSpeechEncoder(nn.Module):
    """Token embedding (scaled) + pos-emb + FFT blocks (reference :710-743)."""

    vocab_size: int
    hidden_size: int = 256
    num_layers: int = 4
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(self, txt_tokens: jax.Array, attn_mask=None, train: bool = False) -> jax.Array:
        padding_mask = txt_tokens == 0
        x = math.sqrt(self.hidden_size) * TokenEmbedding(
            self.vocab_size, self.hidden_size, name="embed_tokens")(txt_tokens)
        x = x + sinusoidal_positional_embedding(
            txt_tokens, self.hidden_size).astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.num_layers > 0:
            x = FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                          self.dropout, self.num_heads, use_pos_embed=False,
                          remat=self.remat,
                          name="fft")(x, padding_mask, attn_mask, train)
        return x


class FastSpeechDecoder(nn.Module):
    hidden_size: int = 256
    num_layers: int = 4
    kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask=None, train: bool = False) -> jax.Array:
        return FFTBlocks(self.hidden_size, self.num_layers, self.kernel_size,
                         self.dropout, self.num_heads, remat=self.remat,
                         name="fft")(x, padding_mask, train=train)


class TransformerEncoder(nn.Module):
    """Token-input transformer encoder used by CampNet
    (speech_editing/commons/transformer.py:713-748)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, txt_tokens: jax.Array, train: bool = False) -> jax.Array:
        return FastSpeechEncoder(self.vocab_size, self.hidden_size, self.num_layers,
                                 self.ffn_kernel_size, self.num_heads, self.dropout,
                                 name="enc")(txt_tokens, train=train)


class TransformerDecoder(nn.Module):
    """Cross-attending mel decoder (speech_editing/commons/
    transformer.py:750-811): learned-alpha sinusoidal pos-emb over
    frame-nonpadding, per-layer nonpadding re-masking, last norm, and the
    FIRST layer's head-averaged enc-dec attention as the returned attn
    (reference ``enc_dec_attn = attns[0]``)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, encoder_out: jax.Array,
                 encoder_padding_mask: Optional[jax.Array] = None,
                 self_attn_padding_mask: Optional[jax.Array] = None,
                 padding_mask: Optional[jax.Array] = None,
                 train: bool = False):
        # frame padding: explicit when the caller knows it (CampNet passes
        # the mel nonpadding); else derived from the input features like the
        # reference (:786-788). For a TRAINED torch checkpoint the two
        # coincide (nonzero Linear biases make valid-frame features nonzero)
        # — but at flax init biases are zero, so deriving from x would
        # classify mask_emb-replaced frames as padding and kill their grads.
        if padding_mask is None:
            padding_mask = jnp.abs(x).sum(-1) == 0
        nonpad = (~padding_mask)[:, :, None].astype(x.dtype)
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        positions = sinusoidal_positional_embedding(
            (~padding_mask).astype(jnp.int32), self.hidden_size)
        x = x + alpha * positions.astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x * nonpad
        attns = []
        for i in range(self.num_layers):
            x, attn = DecSALayer(self.hidden_size, self.num_heads,
                                 dropout=self.dropout,
                                 kernel_size=self.ffn_kernel_size,
                                 name=f"layers_{i}")(
                x, encoder_out, encoder_padding_mask,
                self_attn_padding_mask, train=train)
            x = x * nonpad
            attns.append(attn.mean(axis=1))  # mean over heads -> [B, Tq, Tk]
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x) * nonpad
        return x, attns[0]
