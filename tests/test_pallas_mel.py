"""Fused Pallas mel kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from speech_editing_tpu.ops.mel import MelConfig, mel_spectrogram
from speech_editing_tpu.ops.pallas.mel_kernel import mel_spectrogram_pallas


def test_pallas_mel_matches_xla(rng):
    wav = jnp.asarray(rng.randn(2, 256 * 200).astype(np.float32) * 0.2)
    cfg = MelConfig()
    ref = np.asarray(mel_spectrogram(wav, cfg))
    out = np.asarray(mel_spectrogram_pallas(wav, cfg))
    assert out.shape == ref.shape
    d = np.abs(ref - out)
    # fp32 MXU matmul-DFT vs rFFT: small log-domain deviation
    assert d.max() < 2e-2, d.max()
    assert d.mean() < 2e-3, d.mean()


def test_pallas_mel_1d_and_nonaligned(rng):
    # frame count not a multiple of the 128 tile; 1-D input
    wav = jnp.asarray(rng.randn(256 * 77).astype(np.float32) * 0.2)
    cfg = MelConfig()
    ref = np.asarray(mel_spectrogram(wav, cfg))
    out = np.asarray(mel_spectrogram_pallas(wav, cfg))
    assert out.shape == ref.shape == (1, 78, 80)
    assert np.abs(ref - out).max() < 2e-2


def test_pallas_mel_fallback_on_nonstandard_hop(rng):
    wav = jnp.asarray(rng.randn(1, 200 * 128).astype(np.float32))
    cfg = MelConfig(hop_size=128, fft_size=1024)  # hop*4 != fft -> fallback
    out = np.asarray(mel_spectrogram_pallas(wav, cfg))
    ref = np.asarray(mel_spectrogram(wav, cfg))
    assert np.allclose(out, ref, atol=1e-5)
