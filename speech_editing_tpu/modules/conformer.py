"""Conformer layers with relative-position attention (flax.linen).

Capability parity: the ESPnet-derived conformer used by A3T
(``modules/speech_editing/a3t/conformer_layers.py``,
``modules/commons/conformer/espnet_transformer_attn.py:106-186``,
``espnet_positional_embedding.py:89``): macaron feed-forwards (x2 0.5),
legacy-espnet relative-position multi-head attention (pos_emb rows supplied
per ABSOLUTE position with pos_bias_u/v and the legacy pad-reshape
rel-shift), GLU + depthwise convolution module, pre-LN, masking only at the
attention keys and the stack output — faithfully reproducing the
reference's numerics (including its conv leak across padding boundaries,
which per-layer re-masking would remove).

TPU-first: the position table is a host numpy constant indexed at trace
time (static under jit); rel-shift is the pad/reshape trick (pure
reshapes, no gather); masks multiply or bias, never in-place fill.

Norm choice: the reference uses BatchNorm1d inside the convolution module
and (A3T's) Postnet. Running batch stats are host-visible mutable state
that breaks pure pjit train steps, so training here uses LayerNorm
(``norm_type='ln'``); converted torch checkpoints use
``norm_type='affine'`` — BatchNorm in eval mode is exactly a per-channel
affine, which the converter folds into ``scale``/``bias`` params for
bit-level inference parity.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ESPNET_MAX_LEN = 5000  # reference RelPositionalEncoding max_len


def espnet_rel_pos_emb(t: int, dim: int, max_len: int = ESPNET_MAX_LEN
                       ) -> np.ndarray:
    """First ``t`` rows of the reference's reversed sinusoidal table.

    The reference builds the table once for ``max_len`` REVERSED positions
    (``espnet_positional_embedding.py:89-101``: reverse=True =>
    positions max_len-1 .. 0) and then slices ``pe[:, :T]`` — so row i
    carries position ``max_len-1-i``, NOT ``T-1-i``. Reproduced exactly.
    """
    pos = np.arange(max_len - 1, -1, -1.0, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                 * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe[:t].astype(np.float32)


def _legacy_rel_shift(x: jax.Array) -> jax.Array:
    """ESPnet legacy rel-shift (espnet_transformer_attn.py:126-144):
    [B, H, T1, T2] -> [B, H, T1, T2] with row i shifted left by i.

    Measured index mapping (probed, T=T1=T2):
    ``y[i,j] = x[i, T-1-(i-j)]`` for ``j <= i``; ``0`` at ``j == i+1``;
    ``x[i+1, j-i-2]`` for ``j > i+1`` — note the EXPLICIT dependence on T,
    which is why padded-bucket A3T scores differ from exact-fit ones.
    """
    b, h, t1, t2 = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, t2 + 1, t1)
    return x[:, :, 1:, :].reshape(b, h, t1, t2)


def _true_len_rel_shift(x: jax.Array, true_len: jax.Array) -> jax.Array:
    """Legacy rel-shift evaluated AT EACH ROW'S TRUE sequence length.

    Gather-based emulation of ``_legacy_rel_shift`` with the mapping's
    ``T`` replaced per batch row by ``true_len[b]``: for valid positions
    ``i, j < true_len[b]`` the result is bit-identical to running the
    reshape-trick shift on the row's exact-fit (unpadded) sequence —
    entries with ``i`` or ``j`` beyond ``true_len`` are garbage the
    caller's key mask discards. This is the pad-safe serving fix for A3T
    (VERDICT r4 next#3): with padding compacted AFTER the joint mel+text
    sequence, the only remaining bucket dependence was this mapping's T.
    At ``true_len == T`` it reproduces ``_legacy_rel_shift`` exactly.
    """
    b, h, t1, t2 = x.shape
    i = jnp.arange(t1)[:, None]
    j = jnp.arange(t2)[None, :]
    L = true_len.astype(jnp.int32).reshape(b, 1, 1)
    r_idx = jnp.broadcast_to(jnp.where(j > i, i + 1, i), (b, t1, t2))
    c_idx = jnp.where(j > i, j - i - 2, L - 1 - (i - j))
    flat = jnp.clip(r_idx * t2 + jnp.clip(c_idx, 0, t2 - 1),
                    0, t1 * t2 - 1)
    y = jnp.take_along_axis(x.reshape(b, h, t1 * t2),
                            flat.reshape(b, 1, t1 * t2), axis=-1)
    y = y.reshape(b, h, t1, t2)
    return jnp.where((j == i + 1)[None, None], 0.0, y)


class RelPositionMultiHeadAttention(nn.Module):
    """Legacy espnet RelPositionMultiHeadedAttention
    (espnet_transformer_attn.py:106-186): biased q/k/v/out linears, no-bias
    pos projection, matrix_ac + rel-shifted matrix_bd, key-mask bias, and
    post-softmax zero-fill of masked keys."""

    hidden_size: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, pos_emb: jax.Array,
                 nonpadding: jax.Array,
                 true_len: Optional[jax.Array] = None) -> jax.Array:
        """x [B,T,H]; pos_emb [B or 1, T, H]; nonpadding [B,T] float;
        true_len [B] (pad-safe mode): evaluate the legacy rel-shift at
        each row's true length instead of the padded bucket length."""
        b, t, h = x.shape
        nh, d = self.num_heads, h // self.num_heads
        q = nn.Dense(h, name="linear_q")(x).reshape(b, t, nh, d)
        k = nn.Dense(h, name="linear_k")(x).reshape(b, t, nh, d)
        v = nn.Dense(h, name="linear_v")(x).reshape(b, t, nh, d)
        p = nn.Dense(h, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(pos_emb.shape[0], -1, nh, d)  # [B?, T, nh, d]
        bias_u = self.param(
            "pos_bias_u",
            nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (nh, d))
        bias_v = self.param(
            "pos_bias_v",
            nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (nh, d))

        p = jnp.broadcast_to(p, (b,) + p.shape[1:])  # [1,T,..] -> [B,T,..]
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u[None, None], k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bthd,bshd->bhts", q + bias_v[None, None], p,
                        preferred_element_type=jnp.float32)
        shifted = (_legacy_rel_shift(bd) if true_len is None
                   else _true_len_rel_shift(bd, true_len))
        scores = (ac + shifted) / math.sqrt(d)
        keep = nonpadding[:, None, None, :] > 0  # key mask
        scores = jnp.where(keep, scores, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(keep, attn, 0.0)  # reference post-softmax fill
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        return nn.Dense(h, name="linear_out")(out.reshape(b, t, h))


def _norm(norm_type: str, name: str):
    """'ln' for training; 'affine' = folded eval-mode BatchNorm for
    converted reference checkpoints (per-channel scale/bias)."""
    if norm_type == "affine":
        class _Affine(nn.Module):
            @nn.compact
            def __call__(self, x):
                c = x.shape[-1]
                scale = self.param("scale", nn.initializers.ones, (c,))
                bias = self.param("bias", nn.initializers.zeros, (c,))
                return x * scale + bias
        return _Affine(name=name)
    return nn.LayerNorm(epsilon=1e-5, name=name)


class ConvolutionModule(nn.Module):
    """GLU pointwise -> depthwise -> norm -> swish -> pointwise
    (conformer_layers.py ConvolutionModule). No internal masking — the
    reference applies none, so padding leaks within the kernel radius are
    part of the reproduced behavior."""

    hidden_size: int
    kernel_size: int = 9
    norm_type: str = "ln"

    @nn.compact
    def __call__(self, x: jax.Array,
                 nonpadding: Optional[jax.Array] = None) -> jax.Array:
        h = self.hidden_size
        x = nn.Dense(2 * h, name="pointwise_conv1")(x)
        x = nn.glu(x, axis=-1)
        if nonpadding is not None:
            # pad-safe mode: zero padded lanes so the depthwise conv sees
            # exactly the zeros an exact-fit 'SAME' pad would supply —
            # valid-position outputs then match the unpadded run
            x = x * nonpadding[:, :, None]
        x = nn.Conv(h, (self.kernel_size,), feature_group_count=h,
                    padding="SAME", name="depthwise_conv")(x)
        x = _norm(self.norm_type, "norm")(x)
        x = nn.swish(x)
        return nn.Dense(h, name="pointwise_conv2")(x)


class _FFN(nn.Module):
    """espnet MultiLayeredConv1d with kernel_size=1 == two Dense layers."""

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
    """Macaron conformer block (conformer_layers.py EncoderLayer, pre-LN).
    Matches the reference exactly: masking happens only inside attention;
    the block output is NOT re-masked."""

    hidden_size: int
    kernel_size: int = 9
    num_heads: int = 4
    dropout: float = 0.0
    norm_type: str = "ln"
    pad_safe: bool = False

    @nn.compact
    def __call__(self, x, pos_emb, nonpadding, train: bool = False):
        drop = lambda y: nn.Dropout(self.dropout,
                                    deterministic=not train)(y)
        true_len = (nonpadding.sum(-1) if self.pad_safe else None)
        r = _FFN(self.hidden_size, dropout=self.dropout, name="ff_macaron")(
            nn.LayerNorm(epsilon=1e-5, name="norm_ff_macaron")(x), train=train)
        x = x + 0.5 * drop(r)
        r = RelPositionMultiHeadAttention(
            self.hidden_size, self.num_heads, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm_mha")(x), pos_emb,
            nonpadding, true_len=true_len)
        x = x + drop(r)
        r = ConvolutionModule(self.hidden_size, self.kernel_size,
                              norm_type=self.norm_type, name="conv")(
            nn.LayerNorm(epsilon=1e-5, name="norm_conv")(x),
            nonpadding=nonpadding if self.pad_safe else None)
        x = x + drop(r)
        r = _FFN(self.hidden_size, dropout=self.dropout, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm_ff")(x), train=train)
        x = x + 0.5 * drop(r)
        return nn.LayerNorm(epsilon=1e-5, name="norm_final")(x)


class ConformerLayers(nn.Module):
    """Stack with last-norm; nonpadding derived from input activity, final
    output re-masked (a3t_conformer.py ConformerLayers:15-47)."""

    hidden_size: int
    num_layers: int
    kernel_size: int = 9
    num_heads: int = 4
    dropout: float = 0.0
    norm_type: str = "ln"
    pad_safe: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 pos_emb: Optional[jax.Array] = None,
                 nonpadding: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if nonpadding is None:
            nonpadding = (jnp.abs(x).sum(-1) > 0).astype(x.dtype)
        if pos_emb is None:
            pos_emb = jnp.asarray(
                espnet_rel_pos_emb(x.shape[1], self.hidden_size))[None]
        for i in range(self.num_layers):
            x = ConformerEncoderLayer(
                self.hidden_size, self.kernel_size, self.num_heads,
                self.dropout, self.norm_type, self.pad_safe,
                name=f"layers_{i}")(x, pos_emb, nonpadding, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return x * nonpadding[:, :, None]
