"""Test-loop result writer: wav + spectrogram-plot files for one item.

Parity surface: the reference test loop's async ``save_result``
(``tasks/tts/speech_base.py:335-380``) — wav write, mel heatmap png with an
f0-from-waveform overlay and phone/duration tick marks, optional mel .npy.
Runs inside :class:`speech_editing_tpu.utils.multiprocess.ResultSaverPool`
workers (spawn), so this module keeps imports lazy/light — no jax at
import time.
"""

from __future__ import annotations

import traceback
from typing import Optional

import numpy as np


def save_test_result(wav_out: np.ndarray, mel: Optional[np.ndarray],
                     base_fn: str, gen_dir: str, sr: int,
                     hp_plot: Optional[dict] = None,
                     str_phs: Optional[str] = None,
                     mel2ph: Optional[np.ndarray] = None,
                     save_mel_npy: bool = False) -> str:
    """Write ``wavs/<base_fn>.wav`` (+ ``plot/<base_fn>.png`` when ``mel``
    is given, + ``wavs/<base_fn>_mel.npy``). Returns base_fn."""
    from speech_editing_tpu.utils.audio.io import save_wav

    save_wav(np.asarray(wav_out, np.float32), f"{gen_dir}/wavs/{base_fn}.wav",
             sr)
    if mel is None:
        return base_fn
    mel = np.asarray(mel, np.float32)
    if save_mel_npy:
        np.save(f"{gen_dir}/wavs/{base_fn}_mel.npy", mel)
    hp_plot = hp_plot or {}
    try:
        from speech_editing_tpu.utils.audio.pitch import extract_pitch
        from speech_editing_tpu.utils.plot import spec_to_figure, _plt

        # f0 overlay extracted from the written waveform (reference
        # extract_pitch_simple), plotted at f0/10 over the mel bins
        try:
            f0 = extract_pitch(
                "autocorr", np.asarray(wav_out, np.float32),
                hop_size=int(hp_plot.get("hop_size", 256)),
                audio_sample_rate=sr)
            f0 = np.asarray(f0, np.float32)
            f0 = f0 * (f0 > 0)
        except Exception:
            f0 = None
        dur_info = None
        if mel2ph is not None and str_phs:
            from speech_editing_tpu.utils.audio.align import mel2token_to_dur

            txt = str_phs.split(" ")
            dur = mel2token_to_dur(np.asarray(mel2ph), len(txt))
            dur_info = {"dur_gt": dur, "txt": txt}
        fig = spec_to_figure(
            mel, vmin=hp_plot.get("mel_vmin", -6),
            vmax=hp_plot.get("mel_vmax", 1.5), title=base_fn,
            f0s=None if f0 is None else {"f0": f0}, dur_info=dur_info)
        fig.savefig(f"{gen_dir}/plot/{base_fn}.png", format="png")
        _plt().close(fig)
    except Exception:
        traceback.print_exc()
    return base_fn
