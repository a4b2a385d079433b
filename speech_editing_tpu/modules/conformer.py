"""Conformer layers with relative-position attention (flax.linen).

Capability parity: the ESPnet-derived conformer used by A3T
(``modules/speech_editing/a3t/conformer_layers.py``,
``modules/commons/conformer/espnet_transformer_attn.py:106-186``,
``espnet_positional_embedding.py:89``): macaron feed-forwards (x2 0.5),
Transformer-XL relative-position multi-head attention with pos_bias_u/v and
rel-shift, GLU + depthwise convolution module, pre-LN.

TPU-first: the relative position encoding is the symmetric 2T-1 table
computed once per sequence length (static under jit); rel-shift is the
pad/reshape trick (pure reshapes, no gather); masks multiply instead of
in-place fills.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def rel_pos_table(t: int, dim: int) -> np.ndarray:
    """Sinusoidal embeddings of relative positions T-1 .. -(T-1), [2T-1, dim]."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    table = np.zeros((2 * t - 1, dim))
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def _rel_shift(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] scores over relative offsets -> [B, H, T, T]."""
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, n + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, n)
    return x[:, :, :, :t]


class RelPositionMultiHeadAttention(nn.Module):
    hidden_size: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, nonpadding: jax.Array) -> jax.Array:
        """x [B,T,H]; nonpadding [B,T] float."""
        b, t, h = x.shape
        nh, d = self.num_heads, h // self.num_heads
        q = nn.Dense(h, name="linear_q")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        k = nn.Dense(h, name="linear_k")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        v = nn.Dense(h, name="linear_v")(x).reshape(b, t, nh, d).transpose(0, 2, 1, 3)
        pos = jnp.asarray(rel_pos_table(t, h))
        p = nn.Dense(h, use_bias=False, name="linear_pos")(pos)
        p = p.reshape(2 * t - 1, nh, d).transpose(1, 0, 2)  # [H, 2T-1, d]
        bias_u = self.param("pos_bias_u", nn.initializers.zeros, (nh, d))
        bias_v = self.param("pos_bias_v", nn.initializers.zeros, (nh, d))

        ac = jnp.einsum("bhtd,bhsd->bhts", q + bias_u[None, :, None, :], k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhtd,hnd->bhtn", q + bias_v[None, :, None, :], p,
                        preferred_element_type=jnp.float32)
        scores = (ac + _rel_shift(bd)) / math.sqrt(d)
        mask = nonpadding[:, None, None, :]  # key mask
        scores = jnp.where(mask > 0, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
        return nn.Dense(h, name="linear_out")(out)


class ConvolutionModule(nn.Module):
    """GLU pointwise -> depthwise -> norm -> swish -> pointwise
    (conformer_layers.py ConvolutionModule)."""

    hidden_size: int
    kernel_size: int = 9

    @nn.compact
    def __call__(self, x: jax.Array, nonpadding: jax.Array) -> jax.Array:
        h = self.hidden_size
        x = x * nonpadding[:, :, None]
        x = nn.Dense(2 * h, name="pointwise_conv1")(x)
        x = nn.glu(x, axis=-1)
        x = x * nonpadding[:, :, None]
        x = nn.Conv(h, (self.kernel_size,), feature_group_count=h,
                    padding="SAME", name="depthwise_conv")(x)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.swish(x)
        return nn.Dense(h, name="pointwise_conv2")(x)


class _FFN(nn.Module):
    hidden_size: int
    expansion: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_size * self.expansion, name="w_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.hidden_size, name="w_2")(x)


class ConformerEncoderLayer(nn.Module):
    hidden_size: int
    kernel_size: int = 9
    num_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, nonpadding, train: bool = False):
        # macaron FFN
        r = _FFN(self.hidden_size, dropout=self.dropout, name="ff_macaron")(
            nn.LayerNorm(name="norm_ff_macaron")(x), train=train)
        x = x + 0.5 * r
        # self-attention
        r = RelPositionMultiHeadAttention(
            self.hidden_size, self.num_heads, name="self_attn")(
            nn.LayerNorm(name="norm_mha")(x), nonpadding)
        x = x + r
        # convolution
        r = ConvolutionModule(self.hidden_size, self.kernel_size, name="conv")(
            nn.LayerNorm(name="norm_conv")(x), nonpadding)
        x = x + r
        # FFN
        r = _FFN(self.hidden_size, dropout=self.dropout, name="ff")(
            nn.LayerNorm(name="norm_ff")(x), train=train)
        x = x + 0.5 * r
        return nn.LayerNorm(name="norm_final")(x) * nonpadding[:, :, None]


class ConformerLayers(nn.Module):
    """Stack with last-norm; nonpadding derived from input activity
    (a3t_conformer.py ConformerLayers:15-47)."""

    hidden_size: int
    num_layers: int
    kernel_size: int = 9
    num_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array,
                 nonpadding: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if nonpadding is None:
            nonpadding = (jnp.abs(x).sum(-1) > 0).astype(x.dtype)
        for i in range(self.num_layers):
            x = ConformerEncoderLayer(
                self.hidden_size, self.kernel_size, self.num_heads,
                self.dropout, name=f"layers_{i}")(x, nonpadding, train=train)
        x = nn.LayerNorm(name="layer_norm")(x)
        return x * nonpadding[:, :, None]
