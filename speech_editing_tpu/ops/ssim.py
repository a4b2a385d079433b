"""SSIM in JAX (gaussian 11x11 window), for the mel SSIM loss.

Numerically mirrors the reference ``utils/metrics/ssim.py`` (window 11,
sigma 1.5, C1=1e-4, C2=9e-4, SAME padding) but expresses each separable 1-D
blur as a banded-matrix matmul: single-channel 11-tap convs starve the TPU
MXU, while the (numerically identical) banded matmul runs on the systolic
array and its backward is another matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _band_matrix(n: int, window_size: int = 11,
                 sigma: float = 1.5) -> np.ndarray:
    """[n, n] banded gaussian operator == SAME zero-padded 1-D conv.

    Single-channel 11-tap convs starve the TPU MXU (channel dim 1); the
    same blur as a dense-banded matmul runs on the systolic array and its
    backward is another matmul. Host numpy constant (trace-time), cached
    per length bucket.
    """
    g = _gaussian_window(window_size, sigma)
    pad = window_size // 2
    m = np.zeros((n, n), np.float32)
    for k in range(window_size):
        off = k - pad
        d = np.full(n - abs(off), g[k], np.float32)
        m += np.diag(d, off)
    return m


def _blur(img: jax.Array, window_size: int) -> jax.Array:
    """Separable gaussian blur over the last two dims of [B, T, M]."""
    wt = jnp.asarray(_band_matrix(img.shape[1], window_size))
    wm = jnp.asarray(_band_matrix(img.shape[2], window_size))
    hi = jax.lax.Precision.HIGHEST  # match f32 conv numerics
    x = jnp.einsum("ts,bsm->btm", wt, img, precision=hi)
    return jnp.einsum("btm,mn->btn", x, wm, precision=hi)


def ssim_map(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Per-pixel SSIM of two [B, T, M] images (values expected >= 0)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True) -> jax.Array:
    m = ssim_map(img1, img2, window_size)
    return m.mean() if size_average else m
