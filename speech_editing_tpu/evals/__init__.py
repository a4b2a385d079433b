"""Evaluation: MCD (wav + mel-level), STOI, PESQ (gated), DTW, attention
diagnostics. Batch driver: ``python -m speech_editing_tpu.evals.get_metrics``."""

from speech_editing_tpu.evals.dtw import dtw_path
from speech_editing_tpu.evals.mcd import (cal_mcd, cal_mcd_with_wave_batch,
                                          get_metrics_mels)
from speech_editing_tpu.evals.stoi import cal_stoi_with_waves_batch, stoi

__all__ = ["dtw_path", "cal_mcd", "cal_mcd_with_wave_batch",
           "get_metrics_mels", "cal_stoi_with_waves_batch", "stoi"]
