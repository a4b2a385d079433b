"""Vendored numpy PESQ (evals/pesq_np.py): calibrated invariants + the
get_metrics fallback path (reference eval/pesq_metric.py:36 emits NaN in
this environment; VERDICT r1 item #4)."""

import numpy as np
import pytest

from speech_editing_tpu.evals.pesq_np import pesq_np

SR = 16000


def _speech_like(seconds=3.0, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    env = (np.sin(2 * np.pi * 2.1 * t) ** 2) * \
        (np.sin(2 * np.pi * 0.37 * t) > -0.4)
    f0 = 140 + 20 * np.sin(2 * np.pi * 0.5 * t)
    ph = 2 * np.pi * np.cumsum(f0) / SR
    return (env * (0.6 * np.sin(ph) + 0.3 * np.sin(2 * ph)
                   + 0.15 * np.sin(3 * ph))).astype(np.float64)


def test_pesq_identical_is_max():
    sig = _speech_like()
    assert pesq_np(SR, sig, sig) > 4.0


def test_pesq_monotone_in_snr():
    sig = _speech_like()
    rs = np.random.RandomState(1)
    scores = []
    for snr in [40, 20, 10, 0]:
        noise = rs.randn(len(sig)) * np.sqrt(
            np.mean(sig ** 2) / 10 ** (snr / 10))
        scores.append(pesq_np(SR, sig, sig + noise))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.3  # light noise stays in the "good" range
    assert scores[-1] < 2.2  # heavy noise lands in the "bad" range
    assert all(-0.5 <= s <= 4.5 for s in scores)


def test_pesq_time_alignment():
    """A delayed but otherwise identical copy scores near the maximum
    (P.862's time alignment; without it the score would collapse)."""
    sig = _speech_like()
    delayed = np.concatenate([np.zeros(800), sig])[: len(sig)]
    assert pesq_np(SR, sig, delayed) > 4.0


def test_pesq_gain_invariance():
    """Level alignment: a 10 dB quieter copy still scores near max."""
    sig = _speech_like()
    assert pesq_np(SR, sig, sig * 0.3) > 4.0


def test_pesq_too_short_raises():
    with pytest.raises(ValueError):
        pesq_np(SR, np.zeros(256), np.zeros(256))


def test_cal_pesq_fallback_used():
    """evals.pesq_metric.cal_pesq emits a real number in this environment
    (C package absent -> numpy fallback)."""
    from speech_editing_tpu.evals.pesq_metric import cal_pesq

    sig = _speech_like(2.5)
    val = cal_pesq(sig, sig, SR, "nb")
    assert np.isfinite(val) and val > 4.0


def test_pesq_crossval_vs_canonical_c():
    """Measures the numpy model's deviation from the canonical ITU C
    implementation (the exact binding the reference calls,
    eval/pesq_metric.py:36) over a battery of SNR conditions.

    Skipped when the C ``pesq`` wheel is absent (this zero-egress image);
    in any environment that has it, this test runs automatically and
    enforces the documented bound (PARITY_MEASURED.md): |Δ| mean ≤ 0.35
    MOS, rank order identical. evals.pesq_metric auto-prefers the C
    implementation there, so the numpy model only ever scores *both* sides
    of a comparison — framework-vs-framework deltas stay paired either way.
    """
    cpesq = pytest.importorskip("pesq")
    sig = _speech_like()
    rs = np.random.RandomState(7)
    deltas, ours, theirs = [], [], []
    for snr in [40, 30, 20, 10, 5, 0]:
        noise = rs.randn(len(sig)) * np.sqrt(
            np.mean(sig ** 2) / 10 ** (snr / 10))
        deg = sig + noise
        a = pesq_np(SR, sig, deg)
        b = float(cpesq.pesq(SR, sig.astype(np.float32),
                             deg.astype(np.float32), "nb"))
        ours.append(a), theirs.append(b), deltas.append(abs(a - b))
    assert np.mean(deltas) <= 0.35, (ours, theirs)
    assert np.argsort(ours).tolist() == np.argsort(theirs).tolist()


def test_get_metrics_emits_pesq(tmp_path):
    """compute_all's triple has a finite PESQ over [G_SEG]/[P_SEG] pairs."""
    from speech_editing_tpu.evals.get_metrics import compute_all
    from speech_editing_tpu.utils.audio.io import save_wav

    sig = _speech_like(2.5)
    rs = np.random.RandomState(0)
    noisy = sig + 0.02 * rs.randn(len(sig))
    save_wav(sig.astype(np.float32), str(tmp_path / "[G_SEG]item_0.wav"), SR)
    save_wav(noisy.astype(np.float32), str(tmp_path / "[P_SEG]item_0.wav"), SR)
    m = compute_all(str(tmp_path / "*"))
    assert np.isfinite(m["pesq"]), m
    assert np.isfinite(m["mcd"]) and np.isfinite(m["stoi"])
