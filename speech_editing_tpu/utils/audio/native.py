"""ctypes bindings for the native DSP library (native/fastdsp.cpp).

Native equivalents of the binarizer's hot offline loops — the reference
leans on native third-party DSP there (librosa C/numba STFT+mel,
parselmouth/Praat C++ f0; SURVEY §2.9). Build with
``scripts/build_native.sh``; every entry point here transparently reports
unavailability so callers can fall back to the numpy implementations
(``utils/audio/dsp.py``, ``utils/audio/pitch.py``).

No pybind11: plain C ABI + ctypes, zero-copy via numpy pointers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
SO_PATH = os.path.join(_REPO, "native", "libfastdsp.so")
SRC_PATH = os.path.join(_REPO, "native", "fastdsp.cpp")

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def build(force: bool = False) -> bool:
    """Compile the .so if g++ and the source are available.

    Safe under concurrent callers (binarizer worker pool): compiles to a
    per-pid temp file, then atomically renames — no worker can dlopen a
    half-written ELF.
    """
    if os.path.exists(SO_PATH) and not force:
        return True
    if not os.path.exists(SRC_PATH):
        return False
    tmp = f"{SO_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", SRC_PATH, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, SO_PATH)
        return True
    except (OSError, subprocess.CalledProcessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


_LOAD_FAILED = False


def _bind(lib: ctypes.CDLL) -> None:
    lib.fastdsp_num_frames.restype = ctypes.c_long
    lib.fastdsp_num_frames.argtypes = [ctypes.c_long, ctypes.c_int]
    lib.fastdsp_stft_mel.restype = ctypes.c_int
    lib.fastdsp_stft_mel.argtypes = [
        _f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, _f64p, _f64p,
        ctypes.c_int, ctypes.c_double, _f32p, ctypes.c_void_p, ctypes.c_int]
    lib.fastdsp_autocorr_f0.restype = ctypes.c_int
    lib.fastdsp_autocorr_f0.argtypes = [
        _f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, _f64p, ctypes.c_int, _f64p,
        _f32p, ctypes.c_int]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        return None
    if not os.path.exists(SO_PATH) and not build():
        _LOAD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(SO_PATH)
    except OSError:
        # stale/incompatible binary (e.g. -march=native from another host):
        # rebuild once, else report unavailable so callers fall back to numpy
        if not build(force=True):
            _LOAD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(SO_PATH)
        except OSError:
            _LOAD_FAILED = True
            return None
    _bind(lib)
    if not os.environ.get("FASTDSP_NO_PROBE") and not _probe_subprocess():
        # dlopen succeeded but real calls die (e.g. -march=native binary
        # from a newer host: SIGILL is uncatchable in-process, so probe in
        # a throwaway subprocess); rebuild once for this host, re-probe
        if build(force=True) and _probe_subprocess():
            lib = ctypes.CDLL(SO_PATH)  # fresh handle for the new binary
            _bind(lib)
        else:
            _LOAD_FAILED = True
            return None
    _LIB = lib
    return lib


def _selftest() -> bool:
    """Exercise the SIMD-heavy entry points on tiny inputs (run inside the
    probe subprocess — a SIGILL kills that process, not the caller)."""
    m = stft_mel_native(np.random.RandomState(0).randn(4096).astype(np.float32),
                        n_threads=1)
    return bool(np.isfinite(m).all())


def _probe_subprocess() -> bool:
    import subprocess
    import sys

    code = ("import sys; sys.path.insert(0, %r); "
            "import os; os.environ['FASTDSP_NO_PROBE'] = '1'; "
            "from speech_editing_tpu.utils.audio import native; "
            "sys.exit(0 if native._selftest() else 1)") % _REPO
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=120,
                           capture_output=True)
        return r.returncode == 0
    except (subprocess.SubprocessError, OSError):
        return False


def available() -> bool:
    return _load() is not None


def _n_threads(n_threads: Optional[int]) -> int:
    return n_threads if n_threads else max(os.cpu_count() or 1, 1)


def stft_mel_native(wav: np.ndarray, fft_size: int = 1024,
                    hop_size: int = 256, win_length: int = 1024,
                    num_mels: int = 80, fmin: float = 80, fmax: float = -1,
                    eps: float = 1e-6, sample_rate: int = 22050,
                    want_linear: bool = False,
                    n_threads: Optional[int] = None,
                    window: Optional[np.ndarray] = None,
                    mel_basis: Optional[np.ndarray] = None):
    """log10-mel [T, n_mels] (+ optional linear magnitude [T, n_bins]);
    drop-in for the STFT->mel core of dsp.py::wav2spec. Callers in a hot
    loop should pass precomputed ``window``/``mel_basis``."""
    lib = _load()
    assert lib is not None, "native DSP not built (scripts/build_native.sh)"
    from speech_editing_tpu.utils.audio.dsp import (mel_filterbank,
                                                    stft_window)

    wav = np.ascontiguousarray(wav, np.float32)
    if window is None:
        window = stft_window("hann", win_length, fft_size)
    window = np.ascontiguousarray(window, np.float64)
    if mel_basis is None:
        fmin = 0 if fmin == -1 else fmin
        fmax = sample_rate / 2 if fmax == -1 else fmax
        mel_basis = mel_filterbank(sample_rate, fft_size, num_mels, fmin,
                                   fmax)
    fb = np.ascontiguousarray(mel_basis, np.float64)
    t = int(lib.fastdsp_num_frames(len(wav), hop_size))
    n_bins = fft_size // 2 + 1
    mel = np.empty((t, num_mels), np.float32)
    lin = np.empty((t, n_bins), np.float32) if want_linear else None
    lin_ptr = lin.ctypes.data_as(ctypes.c_void_p) if want_linear else None
    rc = lib.fastdsp_stft_mel(wav, len(wav), fft_size, hop_size, window, fb,
                              num_mels, eps, mel, lin_ptr,
                              _n_threads(n_threads))
    assert rc == t, f"fastdsp_stft_mel failed rc={rc}"
    return (mel, lin) if want_linear else mel


def autocorr_pitch_native(wav: np.ndarray, hop_size: int,
                          sample_rate: int, f0_min: float = 75,
                          f0_max: float = 800,
                          voicing_threshold: float = 0.45,
                          n_threads: Optional[int] = None) -> np.ndarray:
    """f0 per frame; drop-in for pitch.py::autocorr_pitch."""
    lib = _load()
    assert lib is not None, "native DSP not built (scripts/build_native.sh)"
    wav = np.ascontiguousarray(wav, np.float32)
    n_frames = len(wav) // hop_size
    out = np.zeros(n_frames, np.float32)
    if n_frames == 0:
        return out
    win = int(round(3.0 / f0_min * sample_rate))
    win = min(win, len(wav))
    lag_min = max(2, int(sample_rate / f0_max))
    lag_max = min(win - 2, int(sample_rate / f0_min))
    if lag_max <= lag_min:
        return out
    window = np.hanning(win).astype(np.float64)
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    wac = np.fft.irfft(np.abs(np.fft.rfft(window, nfft)) ** 2,
                       nfft)[: lag_max + 2]
    wac_norm = np.ascontiguousarray(
        np.maximum(wac / wac[0], 1e-6), np.float64)
    rc = lib.fastdsp_autocorr_f0(
        wav, len(wav), hop_size, sample_rate, float(f0_min), float(f0_max),
        float(voicing_threshold), window, win, wac_norm, out,
        _n_threads(n_threads))
    assert rc == n_frames, f"fastdsp_autocorr_f0 failed rc={rc}"
    return out
