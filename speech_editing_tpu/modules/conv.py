"""Residual conv stacks (flax.linen), feature-last.

Parity with reference ``modules/commons/conv.py``: ResidualBlock (:24),
ConvBlocks (:68), TextConvEncoder (:119), ConditionalConvBlocks (:142).
Norm types: 'ln' (default in all editing configs), 'gn', 'none'. The
reference's 'bn' option is mapped to GroupNorm(8) — BatchNorm's running
stats are host-visible mutable state that breaks pure pjit train steps and
no shipped editing config uses it.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_editing_tpu.modules.transformer import TokenEmbedding


def _make_norm(norm_type: str, name: str):
    if norm_type == "ln":
        return nn.LayerNorm(epsilon=1e-5, name=name)
    if norm_type in ("gn", "bn", "in"):
        return nn.GroupNorm(num_groups=8, name=name)
    return lambda x: x


class ResidualBlock(nn.Module):
    """n x (norm -> dilated conv(c*m) -> *k^-0.5 -> GELU -> 1x1 conv) with
    residual adds, re-masking padding after every block (reference :24-66)."""

    channels: int
    kernel_size: int
    dilation: int
    n: int = 2
    norm_type: str = "ln"
    dropout: float = 0.0
    c_multiple: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, nonpadding: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.n):
            # mask the norm output BEFORE the conv: with trained (nonzero-β)
            # norms, norm(0)=β at padded frames would leak into real frames
            # through the conv window; masking makes padded buckets see the
            # same zeros as exact-fit SAME padding. Exact no-op at exact fit
            # (mask all-ones) and at torch init (norm bias zero), so the
            # torch-parity tests are unaffected.
            h = _make_norm(self.norm_type, f"norm_{i}")(x) * nonpadding
            h = nn.Conv(self.c_multiple * self.channels, (self.kernel_size,),
                        kernel_dilation=(self.dilation,), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"conv_{i}")(h)
            h = h * self.kernel_size ** -0.5
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Conv(self.channels, (1,),
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"proj_{i}")(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = (x + h) * nonpadding
        return x


class ConvBlocks(nn.Module):
    """Dilated residual conv decoder + last norm + post conv (reference :68)."""

    hidden_size: int
    out_dims: int
    dilations: Sequence[int]
    kernel_size: int
    norm_type: str = "ln"
    layers_in_block: int = 2
    c_multiple: int = 2
    dropout: float = 0.0
    post_net_kernel: int = 3
    num_layers: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, nonpadding: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """x: [B, T, H]; nonpadding: [B, T, 1] or None (derived from x)."""
        dilations = ([1] * self.num_layers if self.num_layers is not None
                     else list(self.dilations))
        if nonpadding is None:
            nonpadding = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
        for i, d in enumerate(dilations):
            x = ResidualBlock(self.hidden_size, self.kernel_size, d,
                              n=self.layers_in_block, norm_type=self.norm_type,
                              dropout=self.dropout, c_multiple=self.c_multiple,
                              name=f"res_{i}")(x, nonpadding, train)
        x = x * nonpadding
        x = _make_norm(self.norm_type, "last_norm")(x) * nonpadding
        x = nn.Conv(self.out_dims, (self.post_net_kernel,), padding="SAME",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="post_net1")(x) * nonpadding
        return x


class TextConvEncoder(nn.Module):
    """Scaled token embedding + ConvBlocks (reference :119-140)."""

    vocab_size: int
    hidden_size: int
    out_dims: int
    dilations: Sequence[int]
    kernel_size: int
    norm_type: str = "ln"
    layers_in_block: int = 2
    dropout: float = 0.0
    post_net_kernel: int = 3

    @nn.compact
    def __call__(self, txt_tokens: jax.Array, train: bool = False) -> jax.Array:
        x = math.sqrt(self.hidden_size) * TokenEmbedding(
            self.vocab_size, self.hidden_size, name="embed_tokens")(txt_tokens)
        nonpadding = (txt_tokens != 0)[:, :, None].astype(x.dtype)
        return ConvBlocks(self.hidden_size, self.out_dims, self.dilations,
                          self.kernel_size, self.norm_type, self.layers_in_block,
                          dropout=self.dropout, post_net_kernel=self.post_net_kernel,
                          name="conv")(x, nonpadding, train)


class ConditionalConvBlocks(nn.Module):
    """ConvBlocks with an additive conv-projected condition (reference :142)."""

    hidden_size: int
    c_out: int
    dilations: Sequence[int]
    kernel_size: int
    norm_type: str = "ln"
    layers_in_block: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array,
                 nonpadding: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        if nonpadding is None:
            nonpadding = (jnp.abs(x).sum(-1, keepdims=True) > 0).astype(x.dtype)
        g = nn.Conv(self.hidden_size, (3,), padding="SAME",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="g_prenet")(cond)
        x = (x + g) * nonpadding
        return ConvBlocks(self.hidden_size, self.c_out, self.dilations,
                          self.kernel_size, self.norm_type, self.layers_in_block,
                          dropout=self.dropout, name="conv")(x, nonpadding, train)
