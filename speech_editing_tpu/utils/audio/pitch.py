"""F0 extraction and pitch normalization utilities.

Replaces the reference's parselmouth (Praat C++) dependency
(``utils/audio/pitch_extractors.py:29-40``) with an original
Boersma-style autocorrelation pitch tracker in numpy, and re-derives the
f0 <-> coarse-bin / log-norm helpers (``utils/audio/pitch/utils.py``).

The norm/denorm helpers are written array-namespace-generically so the same
functions run on numpy (host binarizer) and jax.numpy (inside jitted model
code). ``speech_editing_tpu.ops.pitch`` carries the jittable on-device
tracker (same algorithm, parity-tested) for single-program inference.
"""

from __future__ import annotations

import numpy as np

PITCH_EXTRACTORS = {}


def register_pitch_extractor(name):
    def wrap(fn):
        PITCH_EXTRACTORS[name] = fn
        return fn

    return wrap


def extract_pitch(extractor_name, wav, hop_size, audio_sample_rate,
                  f0_min=75, f0_max=800, **kw) -> np.ndarray:
    # The reference registers only 'parselmouth'; map it to our tracker so
    # existing configs (pitch_extractor: parselmouth) keep working.
    if extractor_name in ("parselmouth", "praat", "ac"):
        extractor_name = "autocorr"
    return PITCH_EXTRACTORS[extractor_name](wav, hop_size, audio_sample_rate,
                                            f0_min, f0_max, **kw)


@register_pitch_extractor("autocorr_native")
def autocorr_pitch_native(wav, hop_size, audio_sample_rate, f0_min=75,
                          f0_max=800, voicing_threshold=0.45, **kw):
    """Threaded C++ tracker (native/fastdsp.cpp), numerically identical to
    :func:`autocorr_pitch`; falls back to numpy when the .so isn't built."""
    from speech_editing_tpu.utils.audio import native

    if not native.available():
        return autocorr_pitch(wav, hop_size, audio_sample_rate, f0_min,
                              f0_max, voicing_threshold, **kw)
    return native.autocorr_pitch_native(
        np.asarray(wav, np.float32), hop_size, audio_sample_rate,
        f0_min, f0_max, voicing_threshold)


@register_pitch_extractor("autocorr")
def autocorr_pitch(wav, hop_size, audio_sample_rate, f0_min=75, f0_max=800,
                   voicing_threshold=0.45, **kw) -> np.ndarray:
    """Normalized-autocorrelation f0 tracker (Boersma 1993 flavor).

    Output matches the reference framing contract: one f0 value per mel frame
    (``len(wav) // hop_size`` values), 0 for unvoiced frames.
    """
    wav = np.asarray(wav, np.float64)
    n_frames = int(len(wav) // hop_size)
    if n_frames == 0:
        return np.zeros(0, np.float32)

    win = int(round(3.0 / f0_min * audio_sample_rate))  # 3 periods of f0_min
    win = min(win, len(wav))
    half = win // 2
    lag_min = max(2, int(audio_sample_rate / f0_max))
    lag_max = min(win - 2, int(audio_sample_rate / f0_min))
    if lag_max <= lag_min:
        return np.zeros(n_frames, np.float32)

    # gather centered frames with edge reflection
    pad = half + 1
    wav_p = np.pad(wav, (pad, pad + win), mode="constant")
    centers = (np.arange(n_frames) * hop_size + hop_size // 2) + pad
    idx = centers[:, None] + np.arange(-half, win - half)[None, :]
    frames = wav_p[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)

    w = np.hanning(win)
    fw = frames * w[None, :]
    # autocorrelation via FFT, normalized by the window autocorrelation
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    spec = np.fft.rfft(fw, nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, : lag_max + 2]
    wspec = np.fft.rfft(w, nfft)
    wac = np.fft.irfft(wspec * np.conj(wspec), nfft)[: lag_max + 2]
    ac0 = np.maximum(ac[:, :1], 1e-12)
    r = (ac / ac0) / np.maximum(wac / wac[0], 1e-6)[None, :]

    seg = r[:, lag_min: lag_max + 1]
    best = np.argmax(seg, axis=1) + lag_min
    # parabolic interpolation around the peak
    r_m1 = r[np.arange(n_frames), best - 1]
    r_0 = r[np.arange(n_frames), best]
    r_p1 = r[np.arange(n_frames), best + 1]
    denom = (r_m1 - 2 * r_0 + r_p1)
    delta = np.where(np.abs(denom) > 1e-9, 0.5 * (r_m1 - r_p1) / denom, 0.0)
    delta = np.clip(delta, -1, 1)
    lag = best + delta
    f0 = audio_sample_rate / np.maximum(lag, 1e-6)

    # voicing decision: peak strength + minimum energy
    rms = np.sqrt((frames ** 2).mean(axis=1))
    voiced = (r_0 > voicing_threshold) & (rms > 1e-4 + 0.02 * np.median(rms))
    f0 = np.where(voiced & (f0 >= f0_min) & (f0 <= f0_max), f0, 0.0)

    # median smoothing to kill octave glitches
    if n_frames >= 3:
        f0_med = np.stack([np.roll(f0, -1), f0, np.roll(f0, 1)]).T
        f0_smooth = np.median(f0_med, axis=1)
        f0 = np.where(f0 > 0, np.where(f0_smooth > 0, f0_smooth, f0), 0.0)
    return f0.astype(np.float32)


# ---------------------------------------------------------------------------
# f0 normalization helpers (namespace-generic: work on np or jnp arrays)
# ---------------------------------------------------------------------------

def _xp(a):
    if type(a).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def f0_to_coarse(f0, f0_bin=256, f0_max=900.0, f0_min=50.0):
    """Quantize Hz f0 to coarse bins 1..255 (0 Hz -> bin 1). Ref ``pitch/utils.py:17``."""
    xp = _xp(f0)
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_mel = 1127 * xp.log(1 + f0 / 700)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = xp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = xp.clip(f0_mel, 1, f0_bin - 1)
    return xp.rint(f0_mel).astype(xp.int32)


def norm_f0(f0, uv, pitch_norm="log", f0_mean=400.0, f0_std=100.0):
    xp = _xp(f0)
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = xp.log2(f0 + 1e-8)
    if uv is not None:
        f0 = xp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0, uv, pitch_norm="log", f0_mean=400.0, f0_std=100.0,
              pitch_padding=None, f_min=50.0, f_max=900.0):
    xp = _xp(f0)
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    f0 = xp.clip(f0, f_min, f_max)
    if uv is not None:
        f0 = xp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = xp.where(pitch_padding, 0.0, f0)
    return f0


def norm_interp_f0(f0: np.ndarray, pitch_norm="log", f0_mean=None, f0_std=None):
    """Log-normalize and linearly interpolate through unvoiced gaps (host-side)."""
    f0 = np.asarray(f0, np.float32)
    uv = (f0 == 0).astype(np.float32)
    f0 = norm_f0(f0, uv, pitch_norm, f0_mean, f0_std)
    n_uv = int(uv.sum())
    if 0 < n_uv < len(f0):
        voiced_idx = np.where(uv == 0)[0]
        f0 = np.where(
            uv > 0,
            np.interp(np.arange(len(f0)), voiced_idx, f0[voiced_idx]).astype(np.float32),
            f0,
        )
    return f0, uv
