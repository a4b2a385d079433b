"""NAR TTS variance predictors (flax.linen).

Parity with reference ``modules/commons/nar_tts_modules.py``:
DurationPredictor (:8-34, Softplus head, per-layer padding re-mask),
PitchPredictor (:75-100, odim=2 -> [f0, uv]), EnergyPredictor (:103).
The LengthRegulator lives in ``ops.seq_ops.length_regulator`` as a pure op.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class DurationPredictor(nn.Module):
    n_chans: int = 384
    n_layers: int = 2
    kernel_size: int = 3
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, x_padding: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """x: [B, S, H]; x_padding: [B, S] bool (True=pad) -> dur [B, S]."""
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            if x_padding is not None:
                x = x * (~x_padding)[:, :, None]
        x = nn.Dense(1, name="linear")(x)
        x = jax.nn.softplus(x)
        if x_padding is not None:
            x = x * (~x_padding)[:, :, None]
        return x[..., 0]


class PitchPredictor(nn.Module):
    n_chans: int = 384
    n_layers: int = 5
    odim: int = 2
    kernel_size: int = 5
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, x_padding: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """x: [B, T, H] -> [B, T, odim] (f0, uv-logit).

        ``x_padding`` [B, T] bool (True=pad): per-layer re-masking like
        DurationPredictor, so frame-bucket padding cannot leak into real
        frames through the conv windows (exact no-op at exact-fit shapes).
        The reference's predictor runs unmasked (nar_tts_modules.py:75-100);
        ``hp['ref_pad_compat']`` keeps callers on that behavior for
        padded-input torch-parity checks."""
        for i in range(self.n_layers):
            x = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            if x_padding is not None:
                x = x * (~x_padding)[:, :, None]
        x = nn.Dense(self.odim, name="linear")(x)
        if x_padding is not None:
            x = x * (~x_padding)[:, :, None]
        return x


class EnergyPredictor(PitchPredictor):
    pass


class MelEncoder(nn.Module):
    """3-layer MLP mel->hidden (reference speech_editing/commons/mel_encoder.py)."""

    hidden_size: int = 192

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = jax.nn.relu(nn.Dense(self.hidden_size, name="fc1")(mel))
        x = jax.nn.relu(nn.Dense(self.hidden_size, name="fc2")(x))
        return nn.Dense(self.hidden_size, name="fc_out")(x)
