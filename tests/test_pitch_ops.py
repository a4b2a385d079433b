"""On-device pitch ops vs the host numpy tracker."""

import numpy as np
import pytest

from speech_editing_tpu.utils.audio.pitch import (autocorr_pitch,
                                                  norm_interp_f0)

SR, HOP = 22050, 256


def _glide(f_start=150.0, f_end=250.0, dur=1.2, amp=0.4, seed=0):
    t = np.arange(int(dur * SR)) / SR
    freq = np.linspace(f_start, f_end, len(t))
    phase = 2 * np.pi * np.cumsum(freq) / SR
    wav = amp * np.sin(phase)
    # unvoiced head/tail: low-level noise
    n_sil = int(0.15 * SR)
    rs = np.random.RandomState(seed)
    wav[:n_sil] = 0.005 * rs.randn(n_sil)
    wav[-n_sil:] = 0.005 * rs.randn(n_sil)
    return wav.astype(np.float32)


def test_extract_pitch_jax_matches_numpy_tracker():
    from speech_editing_tpu.ops.pitch import extract_pitch_jax

    wav = _glide()
    f0_np = autocorr_pitch(wav, HOP, SR, f0_min=80, f0_max=600)
    f0_j = np.asarray(extract_pitch_jax(wav, HOP, SR, 80.0, 600.0))
    assert f0_j.shape == f0_np.shape
    both_voiced = (f0_np > 0) & (f0_j > 0)
    # voicing decisions agree on almost all frames
    agree = ((f0_np > 0) == (f0_j > 0)).mean()
    assert agree > 0.95, f"voicing agreement {agree}"
    assert both_voiced.sum() > 20
    rel = np.abs(f0_j[both_voiced] - f0_np[both_voiced]) / f0_np[both_voiced]
    assert np.median(rel) < 0.01, f"median rel err {np.median(rel)}"
    # tracked values are in the glide range
    assert 140 < np.median(f0_j[both_voiced]) < 260


def test_extract_pitch_jax_tracks_true_frequency():
    from speech_editing_tpu.ops.pitch import extract_pitch_jax

    t = np.arange(SR) / SR
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    f0 = np.asarray(extract_pitch_jax(wav, HOP, SR))
    voiced = f0[f0 > 0]
    assert len(voiced) > 50
    assert abs(np.median(voiced) - 220) < 3


def test_interp_unvoiced_matches_host():
    from speech_editing_tpu.ops.pitch import norm_interp_f0_jax

    rs = np.random.RandomState(1)
    f0 = rs.uniform(100, 300, 80).astype(np.float32)
    f0[rs.rand(80) < 0.3] = 0.0
    f0[:5] = 0.0
    f0[-4:] = 0.0
    host, uv_host = norm_interp_f0(f0.copy())
    dev, uv_dev = norm_interp_f0_jax(f0)
    np.testing.assert_allclose(np.asarray(uv_dev), uv_host)
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-4, atol=1e-4)


def test_interp_unvoiced_edge_cases():
    import jax.numpy as jnp

    from speech_editing_tpu.ops.pitch import interp_unvoiced_jax

    # all unvoiced -> zeros
    assert np.all(np.asarray(interp_unvoiced_jax(jnp.zeros(10))) == 0)
    # all voiced -> identity
    v = jnp.linspace(100, 200, 10)
    np.testing.assert_allclose(np.asarray(interp_unvoiced_jax(v)),
                               np.asarray(v), rtol=1e-6)
    # single voiced frame -> constant fill
    one = jnp.zeros(7).at[3].set(150.0)
    np.testing.assert_allclose(np.asarray(interp_unvoiced_jax(one)),
                               np.full(7, 150.0), rtol=1e-6)
