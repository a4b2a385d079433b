"""On-device mel spectrogram (jittable, batched).

TPU-native replacement for the reference's librosa STFT→mel path
(``utils/audio/__init__.py:64-75``) and the torch STFT used for the HiFi-GAN
mel loss (``modules/vocoder/hifigan/mel_utils.py``): framing is a gather,
windowing/log are fused elementwise, the DFT runs either through XLA's rFFT
or as one MXU matmul (real/imag DFT bases stacked), and the mel projection is
a matmul. Numerics match ``speech_editing_tpu.utils.audio.dsp.wav2spec``
(center=True, constant pad, periodic hann, slaney mel, log10(max(eps, .))).

A fused Pallas kernel for the hot path lives in
``speech_editing_tpu.ops.pallas.mel_kernel`` — this module is the XLA
reference implementation and the fallback.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.utils.audio.dsp import mel_filterbank, stft_window


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 22050
    fft_size: int = 1024
    hop_size: int = 256
    win_length: int = 1024
    num_mels: int = 80
    fmin: float = 55.0
    fmax: float = 7600.0
    eps: float = 1e-6
    window: str = "hann"

    @classmethod
    def from_hparams(cls, hp) -> "MelConfig":
        return cls(
            sample_rate=hp["audio_sample_rate"],
            fft_size=hp["fft_size"],
            hop_size=hp["hop_size"],
            win_length=hp.get("win_size", hp["fft_size"]),
            num_mels=hp["audio_num_mel_bins"],
            fmin=hp["fmin"],
            fmax=hp["fmax"],
        )


@functools.lru_cache(maxsize=8)
def _constants(cfg: MelConfig):
    w = stft_window(cfg.window, cfg.win_length, cfg.fft_size).astype(np.float32)
    basis = mel_filterbank(cfg.sample_rate, cfg.fft_size, cfg.num_mels,
                           cfg.fmin, cfg.fmax)
    return w, basis


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int):
    """Real/imag rDFT bases [n_fft, n_bins] for the matmul formulation."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_wav(wav: jax.Array, cfg: MelConfig, center: bool = True) -> jax.Array:
    """[B, N] -> [B, T, n_fft] overlapping frames (constant center pad)."""
    if center:
        p = cfg.fft_size // 2
        wav = jnp.pad(wav, ((0, 0), (p, p)))
    n_frames = 1 + (wav.shape[1] - cfg.fft_size) // cfg.hop_size
    idx = (np.arange(cfg.fft_size)[None, :]
           + cfg.hop_size * np.arange(n_frames)[:, None])
    return wav[:, idx]


def linear_spectrogram(wav: jax.Array, cfg: MelConfig,
                       use_fft: bool = True) -> jax.Array:
    """[B, N] -> [B, T, n_bins] amplitude spectrogram."""
    w, _ = _constants(cfg)
    frames = frame_wav(wav, cfg) * jnp.asarray(w)[None, None, :]
    if use_fft:
        spec = jnp.fft.rfft(frames, n=cfg.fft_size, axis=-1)
        return jnp.abs(spec).astype(jnp.float32)
    cos_b, sin_b = _dft_bases(cfg.fft_size)
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_b),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_b),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-24)


@functools.partial(jax.jit, static_argnames=("cfg", "use_fft"))
def mel_spectrogram(wav: jax.Array, cfg: MelConfig,
                    use_fft: bool = True) -> jax.Array:
    """[B, N] float wav -> [B, T, num_mels] log10 mel. T = N//hop + 1."""
    if wav.ndim == 1:
        wav = wav[None]
    _, basis = _constants(cfg)
    linear = linear_spectrogram(wav, cfg, use_fft)
    mel = jnp.einsum("btk,mk->btm", linear, jnp.asarray(basis),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(cfg.eps, mel))
