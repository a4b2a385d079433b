"""Silence trimming (offline preprocessing).

The reference uses webrtcvad (``utils/audio/vad.py:15``); that C module is not
available here, so we use a windowed-energy VAD with a moving-average smoother
— functionally equivalent for the trim-long-silences preprocessing role.
"""

from __future__ import annotations

import numpy as np


def trim_long_silences(wav: np.ndarray, sample_rate: int,
                       window_ms: int = 30,
                       smooth_width: int = 8,
                       db_threshold: float = -45.0,
                       max_silence_ms: int = 400) -> np.ndarray:
    """Remove silence stretches longer than ``max_silence_ms``."""
    wav = np.asarray(wav, np.float32)
    win = max(1, int(sample_rate * window_ms / 1000))
    n_win = len(wav) // win
    if n_win == 0:
        return wav
    frames = wav[: n_win * win].reshape(n_win, win)
    rms = np.sqrt(np.mean(frames ** 2, axis=1) + 1e-12)
    db = 20 * np.log10(np.maximum(rms, 1e-8))
    voiced = db > db_threshold
    # moving-average smoothing, then binarize
    kernel = np.ones(smooth_width) / smooth_width
    voiced = np.convolve(voiced.astype(np.float32), kernel, mode="same") > 0.35

    max_sil_win = max(1, int(max_silence_ms / window_ms))
    keep = np.ones(n_win, bool)
    run_start = None
    for i in range(n_win + 1):
        v = voiced[i] if i < n_win else True
        if not v and run_start is None:
            run_start = i
        elif v and run_start is not None:
            run_len = i - run_start
            if run_len > max_sil_win:
                # keep max_sil_win windows of the silence, drop the rest
                keep[run_start + max_sil_win // 2: i - (max_sil_win - max_sil_win // 2)] = False
            run_start = None
    mask = np.repeat(keep, win)
    out = frames.reshape(-1)[mask]
    return np.concatenate([out, wav[n_win * win:]])
