"""Multi-window mel discriminator (flax.linen).

Parity surface: ``modules/tts/ps_adv/multi_window_disc.py`` — per-window
3-layer strided Conv2d stacks with a linear validity head (:6-43), random
fixed-length mel windows per discriminator (:45-100), summed validities.
Used by the adversarial PortaSpeech/StutterSpeech tasks
(``tasks/tts/ps_adv.py:37-40``: windows [32, 64, 128], hidden 128).

TPU-first: window starts come from an explicit PRNG key (jit-pure) and
clips use fixed window lengths (static shapes); LayerNorm replaces
BatchNorm2d (no mutable batch stats inside the GAN step).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SingleWindowDisc(nn.Module):
    time_length: int
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, T_win, n_bins, C] -> (validity [B, 1], hiddens)."""
        h = []
        for i in range(3):
            x = nn.Conv(self.hidden_size, self.kernel, strides=(2, 2),
                        padding="SAME", name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(0.25, deterministic=not train)(x)
            if i < 2:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
            h.append(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, name="adv_layer")(x), h


class MultiWindowDiscriminator(nn.Module):
    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x, x_len, rng: Optional[jax.Array] = None,
                 start_frames: Optional[Sequence] = None,
                 train: bool = False):
        """x [B, T, n_bins]; x_len [B]. Returns dict(y, h, start_frames).

        Windows are clipped at random starts within the valid range; pass
        ``start_frames`` to reuse the generator-step windows for the
        discriminator step (reference start_frames_wins).
        """
        b, t, f = x.shape
        x = x[..., None]  # channel last
        validity = jnp.zeros((b, 1))
        hiddens = []
        starts_out = []
        if start_frames is None:
            assert rng is not None
            keys = jax.random.split(rng, len(self.time_lengths))
            start_frames = [None] * len(self.time_lengths)
        else:
            keys = [None] * len(self.time_lengths)
        for i, win in enumerate(self.time_lengths):
            if start_frames[i] is None:
                max_start = jnp.maximum(x_len - win, 1)
                start = (jax.random.randint(keys[i], (b,), 0, 2 ** 30)
                         % max_start)
            else:
                start = start_frames[i]
            starts_out.append(start)
            idx = start[:, None] + jnp.arange(win)[None, :]
            idx = jnp.clip(idx, 0, t - 1)
            clip = jnp.take_along_axis(x, idx[:, :, None, None], axis=1)
            v, h = SingleWindowDisc(
                win, self.freq_length, self.kernel, self.hidden_size,
                name=f"disc_win{win}")(clip, train=train)
            # per-sample gate: a sample shorter than the window would be
            # scored on padding frames — mask its validity AND its hiddens
            # (feature-matching) to zero. The reference only gates at batch
            # level (clip returns None when max(x_len) < win,
            # multi_window_disc.py:94-97); per-sample is strictly tighter
            # and keeps shapes static for XLA.
            ok = (x_len >= win).astype(v.dtype)[:, None]
            validity = validity + v * ok
            hiddens += [hh * ok[:, :, None, None] for hh in h]
        return {"y": validity, "h": hiddens, "start_frames": starts_out}
