"""Stacked LSTM scanned over time (flax.linen).

TPU-native replacement for the reference's per-timestep Python LSTM loop
(``modules/speech_editing/editspeech/lstm.py:105-137``): the recurrence is a
single ``nn.scan`` — one compiled XLA while-loop instead of T dispatches.
The reference decoder never feeds back its own output (inputs are known in
advance for teacher-forced, free-running and inference branches alike), so
the whole sequence scan is exact, not an approximation.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _LSTMStack(nn.Module):
    """One timestep through ``num_layers`` stacked LSTM cells."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, carry, x_t):
        new_carry = []
        inp = x_t
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"cell_{i}")
            c_i, inp = cell(carry[i], inp)
            new_carry.append(c_i)
        return tuple(new_carry), inp


class LSTMDecoder(nn.Module):
    """[B, T, D_in] -> [B, T, out_dim] via stacked scanned LSTM + linear head
    (reference lstm_decoder, lstm.py:33-50)."""

    hidden_size: int
    out_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, xs: jax.Array) -> jax.Array:
        b = xs.shape[0]
        carry = tuple(
            (jnp.zeros((b, self.hidden_size), xs.dtype),
             jnp.zeros((b, self.hidden_size), xs.dtype))
            for _ in range(self.num_layers))
        scan = nn.scan(
            _LSTMStack, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, hs = scan(self.hidden_size, self.num_layers, name="stack")(carry, xs)
        return nn.Dense(self.out_dim, name="linear")(hs)
