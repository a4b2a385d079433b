"""Native C++ DSP (native/fastdsp.cpp) parity vs the numpy reference path."""

import numpy as np
import pytest

from speech_editing_tpu.utils.audio import native
from speech_editing_tpu.utils.audio.dsp import wav2spec
from speech_editing_tpu.utils.audio.pitch import autocorr_pitch, extract_pitch

SR = 22050


@pytest.fixture(scope="module")
def built():
    if not native.build():
        pytest.skip("g++ unavailable — native DSP not built")
    assert native.available()


def _wav(dur=2.5, seed=0):
    t = np.arange(int(SR * dur)) / SR
    rs = np.random.RandomState(seed)
    wav = (0.4 * np.sin(2 * np.pi * 180 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t)))
           + 0.01 * rs.randn(len(t)))
    return wav.astype(np.float32)


def test_stft_mel_bit_parity(built):
    wav = _wav()
    ref = wav2spec(wav, fft_size=1024, hop_size=256, win_length=1024,
                   num_mels=80, fmin=55, fmax=7600)
    mel, lin = native.stft_mel_native(wav, 1024, 256, 1024, 80, 55, 7600,
                                      want_linear=True)
    assert mel.shape == ref["mel"].shape
    np.testing.assert_array_equal(mel, ref["mel"])  # bit-exact after f32 round
    np.testing.assert_allclose(lin, 10.0 ** ref["linear"], atol=1e-4)


def test_wav2spec_native_backend(built):
    wav = _wav(1.5, seed=3)
    a = wav2spec(wav, fmin=55, fmax=7600, backend="numpy")
    b = wav2spec(wav, fmin=55, fmax=7600, backend="native")
    np.testing.assert_array_equal(a["mel"], b["mel"])
    np.testing.assert_array_equal(a["wav"], b["wav"])
    np.testing.assert_allclose(a["linear"], b["linear"], atol=1e-5)
    c = wav2spec(wav, fmin=55, fmax=7600, backend="auto")
    np.testing.assert_array_equal(a["mel"], c["mel"])


def test_autocorr_f0_parity(built):
    wav = _wav(2.0, seed=1)
    ref = autocorr_pitch(wav, 256, SR, f0_min=80, f0_max=600)
    nat = native.autocorr_pitch_native(wav, 256, SR, 80, 600)
    assert nat.shape == ref.shape
    np.testing.assert_array_equal(nat > 0, ref > 0)  # voicing identical
    np.testing.assert_allclose(nat, ref, atol=1e-3)


def test_registered_native_extractor(built):
    wav = _wav(1.0, seed=2)
    f0 = extract_pitch("autocorr_native", wav, 256, SR, f0_min=80, f0_max=600)
    ref = extract_pitch("autocorr", wav, 256, SR, f0_min=80, f0_max=600)
    np.testing.assert_allclose(f0, ref, atol=1e-3)


def test_threading_consistency(built):
    wav = _wav(3.0, seed=4)
    a = native.stft_mel_native(wav, 1024, 256, 1024, 80, 55, 7600, n_threads=1)
    b = native.stft_mel_native(wav, 1024, 256, 1024, 80, 55, 7600, n_threads=4)
    np.testing.assert_array_equal(a, b)
    pa = native.autocorr_pitch_native(wav, 256, SR, 80, 600, n_threads=1)
    pb = native.autocorr_pitch_native(wav, 256, SR, 80, 600, n_threads=4)
    np.testing.assert_array_equal(pa, pb)


def test_short_and_empty_inputs(built):
    assert native.autocorr_pitch_native(np.zeros(100, np.float32), 256, SR).shape == (0,)
    mel = native.stft_mel_native(np.zeros(1000, np.float32), 1024, 256, 1024,
                                 80, 55, 7600)
    assert mel.shape[0] == 1 + 1000 // 256
    assert np.all(np.isfinite(mel))
