"""Glow-TTS style relative-window transformer encoder (flax.linen).

Parity surface: ``modules/commons/rel_transformer.py`` —
``RelTransformerEncoder`` (:319): optional ConvReluNorm prenet (:284),
multi-head attention with LEARNABLE relative key/value embeddings clamped
to a +-window (:84-236), conv FFN, pre-LN. Backs the ``encoder_type:
rel_fft`` registry option.

TPU-first: the windowed relative logits use a dense [2w+1] embedding
gathered by clipped pairwise distance — one gather + einsum, no banded
matmul gymnastics; everything is static-shape.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvReluNorm(nn.Module):
    hidden_size: int
    kernel_size: int = 5
    n_layers: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        out = x
        for i in range(self.n_layers):
            out = nn.Conv(self.hidden_size, (self.kernel_size,),
                          padding="SAME", name=f"conv_{i}")(out * mask)
            out = nn.LayerNorm(name=f"norm_{i}")(out)
            out = nn.relu(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Dense(self.hidden_size, name="proj",
                       kernel_init=nn.initializers.zeros)(out)
        return (x + out) * mask


class RelWindowAttention(nn.Module):
    hidden_size: int
    num_heads: int = 2
    window_size: int = 4

    @nn.compact
    def __call__(self, x, attn_mask):
        b, t, h = x.shape
        nh, d = self.num_heads, h // self.num_heads
        w = self.window_size
        q = nn.Dense(h, name="q")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        k = nn.Dense(h, name="k")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        v = nn.Dense(h, name="v")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        rel_k = self.param("emb_rel_k", nn.initializers.normal(d ** -0.5),
                           (2 * w + 1, d))
        rel_v = self.param("emb_rel_v", nn.initializers.normal(d ** -0.5),
                           (2 * w + 1, d))
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(d)
        # relative-key logits: distance clipped to the window
        dist = jnp.clip(jnp.arange(t)[None, :] - jnp.arange(t)[:, None],
                        -w, w) + w  # [T, T] in [0, 2w]
        rel_logits = jnp.einsum("bhtd,nd->bhtn", q, rel_k) / jnp.sqrt(d)
        scores = scores + jnp.take_along_axis(
            rel_logits, jnp.broadcast_to(dist[None, None], (b, nh, t, t)),
            axis=-1)
        scores = jnp.where(attn_mask[:, None] > 0, scores, -1e9)
        p = jax.nn.softmax(scores, -1)
        out = jnp.einsum("bhts,bhsd->bhtd", p, v)
        # relative-value contribution
        rel_vals = rel_v[dist]  # [T, T, d]
        out = out + jnp.einsum("bhts,tsd->bhtd", p, rel_vals)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
        return nn.Dense(h, name="out")(out)


class RelTransformerEncoder(nn.Module):
    vocab_size: int
    hidden_size: int
    num_layers: int = 6
    kernel_size: int = 3
    num_heads: int = 2
    window_size: int = 4
    dropout: float = 0.0
    prenet: bool = True

    @nn.compact
    def __call__(self, txt_tokens_or_hidden, train: bool = False):
        h = self.hidden_size
        if txt_tokens_or_hidden.ndim == 2:  # token ids
            tokens = txt_tokens_or_hidden
            x = nn.Embed(self.vocab_size, h, name="emb")(tokens) * (h ** 0.5)
            mask = (tokens > 0)[:, :, None].astype(x.dtype)
        else:  # pre-embedded (vocab_size==0 usage in the reference)
            x = txt_tokens_or_hidden
            mask = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
        attn_mask = (mask[:, :, 0][:, None, :] * mask[:, :, 0][:, :, None])
        if self.prenet:
            x = ConvReluNorm(h, 5, 3, self.dropout, name="pre")(
                x, mask, train=train)
        for i in range(self.num_layers):
            y = RelWindowAttention(h, self.num_heads, self.window_size,
                                   name=f"attn_{i}")(
                nn.LayerNorm(name=f"norm1_{i}")(x) * mask, attn_mask)
            x = (x + nn.Dropout(self.dropout, deterministic=not train)(y)) * mask
            y = nn.Conv(4 * h, (self.kernel_size,), padding="SAME",
                        name=f"ffn1_{i}")(
                nn.LayerNorm(name=f"norm2_{i}")(x) * mask)
            y = nn.relu(y)
            y = nn.Conv(h, (self.kernel_size,), padding="SAME",
                        name=f"ffn2_{i}")(y * mask)
            x = (x + nn.Dropout(self.dropout, deterministic=not train)(y)) * mask
        return nn.LayerNorm(name="last_norm")(x) * mask
