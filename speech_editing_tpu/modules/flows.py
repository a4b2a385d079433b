"""Normalizing flows: residual coupling (ResFlow) + Glow post-flow pieces.

Parity surface:

* :class:`ResFlow` — ``modules/commons/normalizing_flow/res_flow.py``:
  volume-preserving additive coupling steps (WN transform on half the
  channels conditioned on the other half + external cond), channel flip
  between steps, exact reverse;
* :class:`Glow` — the role of ``modules/commons/normalizing_flow/
  glow_modules.py`` (Glow-TTS style post-flow): ActNorm + invertible 1x1 +
  WN affine coupling blocks with log-determinants, conditioned on the
  decoder input, supporting forward (nll) and reverse (sampling).

Feature-last [B, T, C] throughout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.modules.wavenet import WN


class _AdditiveCoupling(nn.Module):
    channels: int
    hidden_size: int
    kernel_size: int
    n_layers: int
    c_cond: int = 0

    @nn.compact
    def __call__(self, x, nonpadding, cond=None, reverse: bool = False):
        c_half = self.channels // 2
        x0, x1 = x[..., :c_half], x[..., c_half:]
        h = nn.Dense(self.hidden_size, name="pre")(x0) * nonpadding
        h = WN(self.hidden_size, self.kernel_size, 1, self.n_layers,
               c_cond=self.c_cond, name="enc")(h, nonpadding, cond)
        m = nn.Dense(c_half, name="post")(h)
        x1 = x1 - m if reverse else x1 + m
        return jnp.concatenate([x0, x1], -1) * nonpadding


class ResFlow(nn.Module):
    """Stack of (coupling, channel-flip) steps; reverse runs them backwards."""

    c_in: int
    hidden_size: int
    kernel_size: int
    n_flow_steps: int = 4
    n_flow_layers: int = 4
    c_cond: int = 0

    @nn.compact
    def __call__(self, x, nonpadding, cond=None, reverse: bool = False):
        layers = [
            _AdditiveCoupling(self.c_in, self.hidden_size, self.kernel_size,
                              self.n_flow_layers, self.c_cond,
                              name=f"coupling_{i}")
            for i in range(self.n_flow_steps)]
        order = reversed(range(self.n_flow_steps)) if reverse \
            else range(self.n_flow_steps)
        for i in order:
            if reverse:
                x = jnp.flip(x, -1)  # undo the flip first
                x = layers[i](x, nonpadding, cond, reverse=True)
            else:
                x = layers[i](x, nonpadding, cond, reverse=False)
                x = jnp.flip(x, -1)
        return x


class _ActNorm(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, nonpadding, reverse: bool = False):
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if reverse:
            x = (x - bias) * jnp.exp(-logs) * nonpadding
            logdet = None
        else:
            x = (bias + jnp.exp(logs) * x) * nonpadding
            logdet = jnp.sum(logs) * jnp.sum(nonpadding[..., 0], -1)
        return x, logdet


class _InvConv(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, nonpadding, reverse: bool = False):
        # orthogonal init keeps |det| = 1 at start
        w = self.param("weight", nn.initializers.orthogonal(),
                       (self.channels, self.channels))
        if reverse:
            w_used = jnp.linalg.inv(w)
            logdet = None
        else:
            w_used = w
            logdet = (jnp.linalg.slogdet(w)[1]
                      * jnp.sum(nonpadding[..., 0], -1))
        # fp32 matmul: bf16 default would break exact invertibility
        x = jnp.einsum("btc,cd->btd", x, w_used,
                       precision=jax.lax.Precision.HIGHEST) * nonpadding
        return x, logdet


class _AffineCoupling(nn.Module):
    channels: int
    hidden_size: int
    kernel_size: int
    n_layers: int
    c_cond: int = 0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x, nonpadding, cond=None, reverse: bool = False):
        c_half = self.channels // 2
        x0, x1 = x[..., :c_half], x[..., c_half:]
        h = nn.Dense(self.hidden_size, name="pre")(x0) * nonpadding
        h = WN(self.hidden_size, self.kernel_size, 1, self.n_layers,
               c_cond=self.c_cond, name="enc")(h, nonpadding, cond)
        out = nn.Dense(2 * c_half, name="post",
                       kernel_init=nn.initializers.zeros)(h)
        m, logs = out[..., :c_half], out[..., c_half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2))
        if reverse:
            x1 = (x1 - m) * jnp.exp(-logs) * nonpadding
            logdet = None
        else:
            x1 = (m + jnp.exp(logs) * x1) * nonpadding
            logdet = jnp.sum(logs * nonpadding, axis=(1, 2))
        return jnp.concatenate([x0, x1], -1), logdet


class Glow(nn.Module):
    """K blocks of [ActNorm -> InvConv -> AffineCoupling] over [B, T, C].

    forward: (z, logdet_total); reverse: x from z. The caller handles any
    channel squeezing; cond is frame-aligned [B, T, C_cond].
    """

    channels: int
    hidden_size: int
    kernel_size: int
    n_blocks: int
    n_layers: int = 4
    c_cond: int = 0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x, nonpadding, cond=None, reverse: bool = False):
        blocks = []
        for i in range(self.n_blocks):
            blocks.append((
                _ActNorm(self.channels, name=f"actnorm_{i}"),
                _InvConv(self.channels, name=f"invconv_{i}"),
                _AffineCoupling(self.channels, self.hidden_size,
                                self.kernel_size, self.n_layers, self.c_cond,
                                self.sigmoid_scale, name=f"coupling_{i}")))
        logdet_total = jnp.zeros(x.shape[0])
        order = reversed(blocks) if reverse else blocks
        for an, ic, cp in order:
            if reverse:
                x = jnp.flip(x, -1)
                x, _ = cp(x, nonpadding, cond, reverse=True)
                x, _ = ic(x, nonpadding, reverse=True)
                x, _ = an(x, nonpadding, reverse=True)
            else:
                x, ld1 = an(x, nonpadding)
                x, ld2 = ic(x, nonpadding)
                x, ld3 = cp(x, nonpadding, cond)
                logdet_total = logdet_total + ld1 + ld2 + ld3
                x = jnp.flip(x, -1)
        return x, (None if reverse else logdet_total)
