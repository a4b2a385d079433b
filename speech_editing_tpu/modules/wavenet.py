"""WaveNet-style gated conv stacks (flax.linen).

Two variants, both feature-last [B, T, C]:

* :class:`WN` — the Glow-TTS conditioning stack (reference
  ``modules/commons/wavenet.py:14-97``): gated tanh/sigmoid convs with a
  shared 1x1 cond layer, residual + skip accumulation. Weight norm is a
  torch optimization-time reparam; we train plain convs and fold
  ``weight_g/weight_v`` when converting torch checkpoints.
* :class:`DiffNetResidualBlock`/:class:`DiffNet` — the FluentSpeech diffusion
  denoiser (reference ``modules/speech_editing/spec_denoiser/diffnet.py``):
  20 gated residual blocks conditioned on (text-states, diffusion-step-emb),
  skip-sum output head with zero-init final projection.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gated_activation(x: jax.Array) -> jax.Array:
    """Split channels into (gate, filter) halves: sigmoid(g) * tanh(f).

    NOTE channel order differs between the two reference stacks: WN uses
    tanh(first)·sigmoid(second); DiffNet uses sigmoid(first)·tanh(second).
    This helper implements the DiffNet order; WN inlines its own.
    """
    gate, filt = jnp.split(x, 2, axis=-1)
    return jax.nn.sigmoid(gate) * jnp.tanh(filt)


class WN(nn.Module):
    hidden_size: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    c_cond: int = 0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, nonpadding: Optional[jax.Array] = None,
                 cond: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        """x: [B, T, H] -> [B, T, H] (skip-sum output)."""
        if nonpadding is None:
            nonpadding = jnp.ones_like(x[..., :1])
        h = self.hidden_size
        if cond is not None:
            cond_all = nn.Conv(2 * h * self.n_layers, (1,), name="cond_layer")(cond)
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = nn.Conv(2 * h, (self.kernel_size,), kernel_dilation=(dilation,),
                           padding="SAME", name=f"in_{i}")(x)
            x_in = nn.Dropout(self.dropout, deterministic=not train)(x_in)
            if cond is not None:
                x_in = x_in + cond_all[..., i * 2 * h:(i + 1) * 2 * h]
            t_act = jnp.tanh(x_in[..., :h])
            s_act = jax.nn.sigmoid(x_in[..., h:])
            acts = t_act * s_act
            if i < self.n_layers - 1:
                rs = nn.Conv(2 * h, (1,), name=f"res_skip_{i}")(acts)
                x = (x + rs[..., :h]) * nonpadding
                output = output + rs[..., h:]
            else:
                output = output + nn.Conv(h, (1,), name=f"res_skip_{i}")(acts)
        return output * nonpadding


def diffusion_step_embedding(t: jax.Array, dim: int) -> jax.Array:
    """[B] int steps -> [B, dim] sinusoidal embedding (diffnet.py:33-46)."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half) * -(math.log(10000) / (half - 1)))
    ang = t.astype(jnp.float32)[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv: declares the identical
    kernel/bias tree (same names, shapes, initializers) so the fused Pallas
    path and the nn.Conv path produce interchangeable checkpoints."""

    kernel_shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.kaiming_normal(),
                       self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros,
                       (self.kernel_shape[-1],))
        return k, b


class DiffNetResidualBlock(nn.Module):
    residual_channels: int
    dilation: int = 1
    allow_fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, step_emb: jax.Array,
                 nonpadding: Optional[jax.Array] = None):
        """x: [B, T, C]; cond: [B, T, H]; step_emb: [B, C];
        nonpadding [B, T, 1] or None -> (x', skip).

        ``nonpadding`` masks the dilated-conv input (x + step): the step
        embedding is a nonzero per-batch constant, so without masking the
        conv window at the last real frames would see (0 + step) at padded
        frames instead of the zeros that exact-fit SAME padding provides —
        frame-bucket padding would change real-frame outputs. Masking is an
        exact no-op at exact-fit shapes."""
        c = self.residual_channels
        step2 = nn.Dense(c, name="diffusion_projection")(step_emb)  # [B, C]
        step = step2[:, None, :]

        from speech_editing_tpu.ops.pallas.diffnet_block import (
            fused_diffnet_block, fused_enabled)

        if (self.allow_fused and self.dilation == 1 and fused_enabled()
                and nonpadding is None):
            # fused Pallas block: conv-as-matmul + gating + projections in
            # one kernel per batch element (see ops/pallas/diffnet_block.py)
            hdim = cond.shape[-1]
            wd, bd = _ConvParams((3, c, 2 * c), name="dilated_conv")()
            wc, bc = _ConvParams((1, hdim, 2 * c),
                                 name="conditioner_projection")()
            wo, bo = _ConvParams((1, c, 2 * c), name="output_projection")()
            return fused_diffnet_block(
                x, cond, step2, wd.reshape(3 * c, 2 * c), bd,
                wc.reshape(hdim, 2 * c), bc, wo.reshape(c, 2 * c), bo)

        y = x + step
        if nonpadding is not None:
            y = y * nonpadding
        y = nn.Conv(2 * c, (3,), kernel_dilation=(self.dilation,), padding="SAME",
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="dilated_conv")(y)
        y = y + nn.Conv(2 * c, (1,),
                        kernel_init=nn.initializers.kaiming_normal(),
                        name="conditioner_projection")(cond)
        y = gated_activation(y)
        y = nn.Conv(2 * c, (1,),
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffNet(nn.Module):
    """x0-predicting WaveNet denoiser. All tensors feature-last:
    spec [B, T, M] -> [B, T, M] (the reference's [B, 1, M, T] layout is a
    CUDA-era convention; lane-major M is the TPU-native choice)."""

    in_dims: int = 80
    encoder_hidden: int = 192
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 1
    remat: bool = False  # rematerialize blocks in bwd: the train step is
    # HBM-bound, so recomputing activations beats storing/reloading them
    allow_fused: bool = False  # fused Pallas block (dilation 1). Default OFF:
    # measured SLOWER than XLA's own fusion at both bench shapes
    # (BASELINE.md "fused DiffNet A/B"); kept as an experimentation gate

    @nn.compact
    def __call__(self, spec: jax.Array, diffusion_step: jax.Array,
                 cond: jax.Array,
                 nonpadding: Optional[jax.Array] = None) -> jax.Array:
        """``nonpadding`` [B, T, 1]: see DiffNetResidualBlock — makes
        frame-bucket padding inert (no-op at exact fit)."""
        c = self.residual_channels
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="input_projection")(spec)
        x = jax.nn.relu(x)
        # cast BEFORE the MLP: an f32 sinusoid input would promote the
        # whole step-embedding path (and y = x + step) back to f32
        step = diffusion_step_embedding(diffusion_step, c).astype(spec.dtype)
        step = nn.Dense(c * 4, name="mlp_1")(step)
        step = step * jnp.tanh(jax.nn.softplus(step))  # Mish
        step = nn.Dense(c, name="mlp_2")(step)
        skip_sum = jnp.zeros_like(x)
        block_cls = (nn.remat(DiffNetResidualBlock) if self.remat
                     else DiffNetResidualBlock)
        for i in range(self.residual_layers):
            x, skip = block_cls(
                c, 2 ** (i % self.dilation_cycle_length),
                allow_fused=self.allow_fused,
                name=f"residual_{i}")(x, cond, step, nonpadding)
            skip_sum = skip_sum + skip
        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.Conv(c, (1,), kernel_init=nn.initializers.kaiming_normal(),
                    name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.in_dims, (1,), kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x
