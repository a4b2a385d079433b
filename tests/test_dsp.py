"""DSP golden tests: STFT vs torch.stft, mel filterbank invariants,
numpy<->JAX spectrogram parity."""

import numpy as np
import pytest

from speech_editing_tpu.utils.audio import dsp


def _chirp(n=22050, sr=22050):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * (220 + 200 * t) * t)).astype(np.float32)


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    y = _chirp(8000)
    ours = dsp.stft(y, n_fft=1024, hop_size=256, win_length=1024)
    ref = torch.stft(
        torch.from_numpy(y).double(), n_fft=1024, hop_length=256,
        win_length=1024, window=torch.hann_window(1024, dtype=torch.float64),
        center=True, pad_mode="constant", return_complex=True).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=1e-6)


def test_stft_short_window_and_framecount():
    y = _chirp(10000)
    s = dsp.stft(y, n_fft=1024, hop_size=256, win_length=800)
    assert s.shape[0] == 513
    assert s.shape[1] == 1 + 10000 // 256  # librosa center=True frame count


def test_mel_filterbank_invariants():
    fb = dsp.mel_filterbank(22050, 1024, 80, fmin=55, fmax=7600)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support, and supports are ordered by center freq
    centers = np.argmax(fb, axis=1)
    assert (np.diff(centers) >= 0).all()
    assert fb.sum() > 0
    # slaney norm: filters integrate to ~2/bandwidth -> rows not all equal
    df = 22050 / 2 / 512
    areas = fb.sum(axis=1) * df
    assert np.all(areas > 0.5) and np.all(areas < 2.5)


def test_wav2spec_contract():
    y = _chirp(22050)
    out = dsp.wav2spec(y, fft_size=1024, hop_size=256, win_length=1024,
                       num_mels=80, fmin=55, fmax=7600, sample_rate=22050)
    mel, wav = out["mel"], out["wav"]
    assert mel.shape[1] == 80
    assert len(wav) == mel.shape[0] * 256
    assert mel.min() >= np.log10(1e-6) - 1e-6


def test_jax_mel_matches_numpy():
    from speech_editing_tpu.ops.mel import MelConfig, mel_spectrogram

    y = _chirp(12800)
    cfg = MelConfig()
    ref = dsp.wav2spec(y, fft_size=1024, hop_size=256, win_length=1024,
                       num_mels=80, fmin=55, fmax=7600, sample_rate=22050)
    got = np.asarray(mel_spectrogram(y[None], cfg))[0]
    assert got.shape[0] >= ref["mel"].shape[0]
    got = got[: ref["mel"].shape[0]]
    # f32 FFT vs f64: compare amplitudes relative to the peak (log10 values
    # near the eps floor amplify rounding noise irrelevant to MCD parity)
    a, b = 10.0 ** got, 10.0 ** ref["mel"]
    np.testing.assert_allclose(a, b, atol=2e-4 * b.max())
    # and log values agree tightly wherever there is real energy
    energized = ref["mel"] > ref["mel"].max() - 3
    np.testing.assert_allclose(got[energized], ref["mel"][energized], atol=2e-3)


def test_jax_mel_matmul_dft_matches_fft():
    from speech_editing_tpu.ops.mel import MelConfig, mel_spectrogram

    y = _chirp(6400)
    cfg = MelConfig()
    a = 10.0 ** np.asarray(mel_spectrogram(y[None], cfg, use_fft=True))
    b = 10.0 ** np.asarray(mel_spectrogram(y[None], cfg, use_fft=False))
    np.testing.assert_allclose(a, b, atol=2e-4 * b.max())


def test_istft_roundtrip():
    y = _chirp(8000)
    s = dsp.stft(y, 1024, 256, 1024)
    y2 = dsp.istft(s, 256, 1024, length=len(y))
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_griffin_lim_runs():
    from speech_editing_tpu.utils.audio.griffin_lim import mel2wav_griffin_lim

    y = _chirp(5120)
    out = dsp.wav2spec(y, fmin=55, fmax=7600)
    wav = mel2wav_griffin_lim(out["mel"], n_iters=3)
    assert wav.ndim == 1 and len(wav) > 1000


def test_pitch_tracker_on_synthetic_tone():
    from speech_editing_tpu.utils.audio.pitch import extract_pitch

    sr, f0_true = 22050, 220.0
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * f0_true * t)
    f0 = extract_pitch("parselmouth", y, 256, sr, f0_min=80, f0_max=600)
    assert len(f0) == sr // 256
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.7 * len(f0)
    assert abs(np.median(voiced) - f0_true) < 5.0


def test_f0_coarse_roundtrip():
    from speech_editing_tpu.utils.audio.pitch import (
        denorm_f0, f0_to_coarse, norm_interp_f0)

    f0 = np.array([0, 0, 120, 125, 130, 0, 200, 210, 0], np.float32)
    c = f0_to_coarse(np.where(f0 == 0, 0.0, f0))
    assert c.min() >= 1 and c.max() <= 255
    f0n, uv = norm_interp_f0(f0)
    assert uv.tolist() == (f0 == 0).astype(float).tolist()
    back = denorm_f0(f0n, uv)
    np.testing.assert_allclose(back[f0 > 0], f0[f0 > 0], rtol=1e-4)
    assert (back[f0 == 0] == 0).all()
