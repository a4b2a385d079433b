"""Eval harness: MCD, STOI, DTW, attention metrics, plotting."""

import numpy as np
import pytest

from speech_editing_tpu.evals.attention_metrics import (
    get_diagonal_focus_rate, get_focus_rate, get_phone_coverage_rate,
    laplace_var, pitch_dtw_distance)
from speech_editing_tpu.evals.dtw import dtw_path
from speech_editing_tpu.evals.mcd import (cal_mcd, get_metrics_mels, wav_mfcc)
from speech_editing_tpu.evals.stoi import stoi
from speech_editing_tpu.utils.audio.io import save_wav


def _tone(freq, dur=1.0, sr=22050, noise=0.0, seed=0):
    t = np.arange(int(sr * dur)) / sr
    w = 0.4 * np.sin(2 * np.pi * freq * t)
    if noise:
        w = w + noise * np.random.RandomState(seed).randn(len(t))
    return w.astype(np.float32)


def test_dtw_identity_and_shift():
    x = np.random.RandomState(0).randn(20, 4)
    cost, path = dtw_path(x, x)
    assert cost == pytest.approx(0.0, abs=1e-6)
    assert path == [(i, i) for i in range(20)]
    cost2, _ = dtw_path(x, x + 1.0)
    assert cost2 > 0


def test_wav_mcd_orders_degradation(tmp_path):
    sr = 22050
    clean = _tone(220)
    save_wav(clean, str(tmp_path / "ref.wav"), sr)
    save_wav(_tone(220, noise=0.01, seed=1), str(tmp_path / "close.wav"), sr)
    save_wav(_tone(330, noise=0.1, seed=2), str(tmp_path / "far.wav"), sr)
    mcd_close = cal_mcd((str(tmp_path / "ref.wav"), str(tmp_path / "close.wav")))
    mcd_far = cal_mcd((str(tmp_path / "ref.wav"), str(tmp_path / "far.wav")))
    assert 0 < mcd_close < mcd_far
    mcd_same = cal_mcd((str(tmp_path / "ref.wav"), str(tmp_path / "ref.wav")))
    assert mcd_same == pytest.approx(0.0, abs=1e-6)


def test_mel_mcd_dtw():
    rs = np.random.RandomState(0)
    mel = np.abs(rs.randn(60, 80)) + 0.1
    mcd0, pen0, _ = get_metrics_mels(mel, mel)
    assert mcd0 == pytest.approx(0.0, abs=1e-6) and pen0 == 0
    mcd1, _, _ = get_metrics_mels(mel, np.abs(rs.randn(70, 80)) + 0.1)
    assert mcd1 > 0


def test_stoi_behavior():
    sr = 22050
    clean = _tone(220, dur=1.5)
    s_self = stoi(clean, clean, sr)
    noisy = clean + 0.4 * np.random.RandomState(0).randn(len(clean)).astype(np.float32)
    s_noisy = stoi(clean, noisy, sr)
    assert s_self > 0.99
    assert s_noisy < s_self


def test_attention_metrics():
    b, t_dec, t_enc = 2, 40, 10
    attn = np.zeros((b, t_dec, t_enc))
    for i in range(t_dec):  # perfectly diagonal attention
        attn[:, i, min(i * t_enc // t_dec, t_enc - 1)] = 1.0
    fr = get_focus_rate(attn)
    assert np.allclose(fr, 1.0)
    cov = get_phone_coverage_rate(attn)
    assert np.all(cov == 1.0)
    ks = np.full(b, t_dec / t_enc)
    dfr = get_diagonal_focus_rate(attn, ks, np.full(b, t_dec), band_width=3)
    assert np.all(dfr > 0.9)
    assert laplace_var(np.random.RandomState(0).randn(30, 30)) > 0
    assert pitch_dtw_distance(np.ones(20) * 100, np.ones(25) * 100) == \
        pytest.approx(0.0, abs=1e-6)


def test_spec_figure():
    from speech_editing_tpu.utils.plot import figure_to_image, spec_to_figure

    spec = np.random.RandomState(0).randn(50, 80)
    fig = spec_to_figure(spec, f0s={"f0": np.ones(50) * 100},
                         dur_info={"dur_gt": [10, 20, 20], "txt": ["a", "b", "c"]})
    img = figure_to_image(fig)
    assert img.ndim == 3 and img.shape[2] == 3


def test_batch_tools_freqt_and_mcep():
    from speech_editing_tpu.evals.batch_tools import (best_mcep_params, freqt,
                                                      mcep_from_wav)

    c = np.array([1.0, 0.5, 0.25, 0.125])
    # alpha=0 => identity (truncate/zero-pad to order+1)
    assert np.allclose(freqt(c, 3, 0.0), c)
    assert np.allclose(freqt(c, 5, 0.0), np.pad(c, (0, 2)))
    order, alpha = best_mcep_params(22050)
    m = mcep_from_wav(_tone(220, dur=0.5), 22050)
    assert m.shape[1] == order + 1
    assert np.all(np.isfinite(m))
    # a tone's mcep should differ from white noise's
    noise = np.random.RandomState(0).randn(11025).astype(np.float32) * 0.1
    m2 = mcep_from_wav(noise, 22050)
    t = min(len(m), len(m2))
    assert np.abs(m[:t, 1:] - m2[:t, 1:]).mean() > 0.01


def test_batch_tools_clis(tmp_path):
    from speech_editing_tpu.evals.batch_tools import (cal_mcd_sptk,
                                                      cal_mcd_sptk_batch,
                                                      meta_csv_stats,
                                                      pitch_comparison_batch,
                                                      separate_wavs)

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    gt = _tone(220, dur=0.6)
    pred = _tone(225, dur=0.6, noise=0.02)
    save_wav(gt, str(wavs / "[G_SEG]item0.wav"), 22050)
    save_wav(pred, str(wavs / "[P_SEG]item0.wav"), 22050)
    save_wav(gt, str(wavs / "[G]item0.wav"), 22050)
    save_wav(pred, str(wavs / "[P]item0.wav"), 22050)
    pat = str(wavs / "*")
    # identical pair -> ~0 MCD; perturbed pair -> small positive
    assert cal_mcd_sptk((str(wavs / "[G_SEG]item0.wav"),) * 2) < 1e-6
    assert cal_mcd_sptk_batch(pat) > 0
    assert pitch_comparison_batch(pat) >= 0
    meta = tmp_path / "meta.csv"
    meta.write_text("item_name,dur_loss,wav_fn\nitem0,0.5,a.wav\nitem1,0.7,b.wav\n")
    stats = meta_csv_stats(str(meta))
    assert stats["dur_loss"] == pytest.approx(0.6)
    assert "wav_fn" not in stats and "item_name" not in stats
    gt_dir, gen_dir = separate_wavs(str(tmp_path))
    import os
    assert os.path.exists(os.path.join(gt_dir, "[G]item0.wav"))
    assert os.path.exists(os.path.join(gen_dir, "[P]item0.wav"))
    assert not os.path.exists(os.path.join(gen_dir, "[P_SEG]item0.wav"))
