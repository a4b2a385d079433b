"""Continuous wavelet transform of log-f0 (10 dyadic Mexican-hat scales).

Parity surface: ``utils/audio/cwt.py`` in the reference (pycwt-based
``get_lf0_cwt``/``get_cont_lf0``/``cwt2f0``): decompose the normalized
continuous log-f0 into 10 scales for CWT-domain pitch prediction
(FastSpeech2 'cwt' pitch type), plus the standard analytic reconstruction
``sum_i W[:, i] * (i + 2.5)^(-2.5)``.

numpy forward (offline/binarize side) + jnp reconstruction (in-model).
"""

from __future__ import annotations

import numpy as np

DT = 0.005
DJ = 1.0  # one scale per octave


def _mexican_hat(t: np.ndarray) -> np.ndarray:
    return ((1.0 - t ** 2) * np.exp(-t ** 2 / 2.0)
            * 2.0 / (np.sqrt(3.0) * np.pi ** 0.25))


def cwt_mexh(x: np.ndarray, num_scales: int = 10, dt: float = DT):
    """[T] -> (W [T, num_scales], scales). Scales are dyadic: s_j = 2*dt*2^j."""
    t_len = len(x)
    scales = np.asarray([2.0 * dt * (2.0 ** j) for j in range(num_scales)])
    w = np.zeros((t_len, num_scales))
    for j, s in enumerate(scales):
        half = int(min(10.0 * s / dt, t_len))
        tt = (np.arange(-half, half + 1) * dt) / s
        kernel = _mexican_hat(tt) * (dt / np.sqrt(s))
        full = np.convolve(x, kernel, mode="full")  # len t_len + 2*half
        w[:, j] = full[half: half + t_len]
    return w, scales


def get_cont_lf0(f0: np.ndarray, frame_period: float = 5.0):
    """Interpolate unvoiced gaps of f0 and return (uv, continuous log-f0)."""
    uv = (f0 == 0).astype(np.float32)
    f0 = np.asarray(f0, np.float64)
    if (f0 > 0).sum() <= 1:
        return uv, np.zeros_like(f0)
    nz = np.where(f0 > 0)[0]
    cont = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, np.log(cont)


def norm_scale(w: np.ndarray):
    mean = w.mean(0, keepdims=True)
    std = w.std(0, keepdims=True) + 1e-8
    return (w - mean) / std, mean[0], std[0]


def get_lf0_cwt(lf0: np.ndarray, num_scales: int = 10):
    """Continuous lf0 [T] -> (Wavelet_lf0 [T, scales], scales)."""
    return cwt_mexh(np.asarray(lf0, np.float64), num_scales)


def cwt2f0(cwt_spec, mean, std, cwt_scales=None):
    """Reconstruct LINEAR-domain f0 from (possibly predicted) CWT spec.

    cwt_spec [B, T, 10]; mean/std [B]. jnp-compatible (runs in-model).
    Parity: reference ``utils/audio/cwt.py:118-144`` — inverse CWT with
    weights W[:, i] * (i + 2.5)^(-2.5), per-utterance standardization of the
    reconstruction, de-normalization by the (predicted) lf0 mean/std, then
    ``exp`` back to linear Hz (the caller re-normalizes with ``norm_f0``).
    """
    import jax.numpy as jnp

    num_scales = cwt_spec.shape[-1]
    # reference inverse_cwt: b = (arange(J) + 1 + 2.5) ** -2.5
    widths = jnp.asarray([(i + 1 + 2.5) ** (-2.5) for i in range(num_scales)])
    lf0 = jnp.sum(cwt_spec * widths[None, None, :], axis=-1)
    lf0 = (lf0 - lf0.mean(axis=-1, keepdims=True)) / (
        lf0.std(axis=-1, keepdims=True) + 1e-8)
    lf0 = lf0 * std[:, None] + mean[:, None]
    return jnp.exp(lf0)


def f0_to_cwt(f0: np.ndarray, num_scales: int = 10):
    """Offline: raw f0 [T] -> dict(cwt_spec [T,10], mean, std) for binarize.

    Reference convention (base_binarizer.py:248-255 + cwt.py
    ``get_lf0_cwt(cont_lf0_lpf_norm)``): the continuous lf0 is standardized
    by its own mean/std FIRST, then decomposed; the stored spec holds the
    RAW wavelet coefficients — the inverse's fixed per-scale weights rely
    on the natural inter-scale amplitude ratios, so no per-scale
    standardization is applied here.
    """
    _, lf0 = get_cont_lf0(f0)
    mean, std = float(lf0.mean()), float(lf0.std() + 1e-8)
    w, scales = get_lf0_cwt((lf0 - mean) / std, num_scales)
    return {"cwt_spec": w.astype(np.float32),
            "cwt_mean": mean, "cwt_std": std}
