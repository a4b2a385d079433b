"""Vocoder training losses: GAN-loss mel + multi-resolution STFT loss.

Capability parity with the reference's torch-native spectral losses:

* :func:`gan_mel_spectrogram` — ``modules/vocoder/hifigan/mel_utils.py:45-80``
  (clamp, (n_fft-hop)/2 reflect pad, non-centered STFT, slaney mel,
  natural-log dynamic range compression at clip 1e-5);
* :func:`stft_magnitude` / :func:`multi_resolution_stft_loss` —
  ``modules/vocoder/hifigan/stft_loss.py`` (spectral convergence + log-mag
  L1 over resolutions (1024,120,600), (2048,240,1200), (512,50,240)).

All functions are pure, jittable, batched over ``[B, N]`` wavs, and keep
the whole loss inside one XLA program (framing is a gather, the DFT runs
as cos/sin MXU matmuls — TPU's rFFT lowering is ~100x slower — and the mel
projection is another matmul).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.utils.audio.dsp import mel_filterbank, stft_window


@functools.lru_cache(maxsize=16)
def _window(win_length: int, n_fft: int) -> np.ndarray:
    return stft_window("hann", win_length, n_fft).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT as two [n_fft, n_fft//2+1] matmul operands (host constants).

    ``jnp.fft.rfft`` lowers terribly on TPU (measured ~100x slower than the
    equivalent matmul at mel-frontend shapes — BASELINE.md); the windowed
    DFT over 1024-point frames is a perfect MXU matmul instead.
    """
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def _rfft_magnitude(frames: jax.Array, n_fft: int, eps: float) -> jax.Array:
    """|rfft(frames)| via DFT matmuls: [B, T, n_fft] -> [B, T, n_fft//2+1]."""
    cos_m, sin_m = _dft_matrices(n_fft)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_m), precision=hi)
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_m), precision=hi)
    return jnp.sqrt(jnp.maximum(re * re + im * im, eps))


def _frame(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[B, N] -> [B, T, n_fft] frames, no padding (caller pads)."""
    n_frames = 1 + (wav.shape[1] - n_fft) // hop
    idx = (np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None])
    return wav[:, idx]


def stft_magnitude(wav: jax.Array, n_fft: int, hop: int, win_length: int,
                   center: bool = True, eps: float = 1e-7) -> jax.Array:
    """[B, N] -> [B, T, n_fft//2+1] magnitude (torch.stft conventions:
    center=True reflect pad, window zero-padded to n_fft)."""
    if center:
        p = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    frames = _frame(wav, n_fft, hop) * jnp.asarray(_window(win_length, n_fft))
    return _rfft_magnitude(frames, n_fft, eps)


@functools.lru_cache(maxsize=8)
def _gan_mel_basis(sample_rate: int, n_fft: int, num_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    return mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax)


def gan_mel_spectrogram(wav: jax.Array, hp) -> jax.Array:
    """[B, N] wav -> [B, T, num_mels] natural-log mel, matching the
    reference GAN-loss mel (mel_utils.py mel_spectrogram, center=False)."""
    n_fft = hp["fft_size"]
    hop = hp["hop_size"]
    win = hp.get("win_size", n_fft)
    wav = jnp.clip(wav, -1.0, 1.0)
    p = (n_fft - hop) // 2
    wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    frames = _frame(wav, n_fft, hop) * jnp.asarray(_window(win, n_fft))
    mag = _rfft_magnitude(frames, n_fft, 1e-9)
    basis = _gan_mel_basis(hp["audio_sample_rate"], n_fft,
                           hp["audio_num_mel_bins"], hp["fmin"], hp["fmax"])
    mel = jnp.einsum("btk,mk->btm", mag, jnp.asarray(basis),
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, 1e-5))


def _stft_loss_single(x: jax.Array, y: jax.Array, n_fft: int, hop: int,
                      win: int) -> Tuple[jax.Array, jax.Array]:
    x_mag = stft_magnitude(x, n_fft, hop, win)
    y_mag = stft_magnitude(y, n_fft, hop, win)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.maximum(jnp.linalg.norm(y_mag), 1e-8)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def multi_resolution_stft_loss(
        x: jax.Array, y: jax.Array,
        resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> Tuple[jax.Array, jax.Array]:
    """Averaged (spectral-convergence, log-magnitude) loss pair over
    resolutions; x = predicted wav [B, N], y = ground truth."""
    sc_total, mag_total = 0.0, 0.0
    for n_fft, hop, win in resolutions:
        sc, mag = _stft_loss_single(x, y, n_fft, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
