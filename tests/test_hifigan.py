"""HiFi-GAN vocoder tests: shapes, jit, GAN losses, STFT losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.models.vocoder import (
    HifiGanGenerator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    discriminator_loss, feature_loss, gan_mel_spectrogram, generator_loss,
    multi_resolution_stft_loss)

TINY_HP = {
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "upsample_initial_channel": 32,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3], [1, 3]],
}


def test_generator_shape_and_jit():
    model = HifiGanGenerator(hp=TINY_HP)
    mel = jnp.zeros((2, 16, 80))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = jax.jit(model.apply)(params, mel)
    # output length = T * prod(upsample_rates)
    assert wav.shape == (2, 16 * 4 * 4 * 2)
    assert np.isfinite(np.asarray(wav)).all()


def test_resblock2_variant():
    hp = dict(TINY_HP, resblock="2")
    model = HifiGanGenerator(hp=hp)
    mel = jnp.zeros((1, 8, 80))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 8 * 32)


def test_discriminators_and_losses():
    n = 4 * 4 * 2 * 16
    key = jax.random.PRNGKey(1)
    y = jax.random.normal(key, (2, n)) * 0.1
    y_hat = y + 0.01

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    p_mpd = mpd.init(jax.random.PRNGKey(2), y, y_hat)
    o_r, o_g, f_r, f_g = mpd.apply(p_mpd, y, y_hat)
    assert len(o_r) == 2 and len(f_r) == 2

    msd = MultiScaleDiscriminator(num_scales=2)
    p_msd = msd.init(jax.random.PRNGKey(3), y, y_hat)
    s_r, s_g, sf_r, sf_g = msd.apply(p_msd, y, y_hat)
    assert len(s_r) == 2

    g_loss = generator_loss(o_g)
    r_loss, f_loss = discriminator_loss(o_r, o_g)
    fm = feature_loss(f_r, f_g)
    for v in (g_loss, r_loss, f_loss, fm):
        assert np.isfinite(float(v))


def test_gan_mel_matches_frame_count():
    hp = {"fft_size": 1024, "hop_size": 256, "win_size": 1024,
          "audio_sample_rate": 22050, "audio_num_mel_bins": 80,
          "fmin": 55, "fmax": 7600}
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 256 * 40) * 0.1,
                      jnp.float32)
    mel = gan_mel_spectrogram(wav, hp)
    # center=False after (n_fft-hop)/2 pad each side:
    # frames = 1 + (N + (n_fft-hop) - n_fft)//hop = N//hop for hop-multiple N
    assert mel.shape == (1, 40, 80)
    assert np.isfinite(np.asarray(mel)).all()


def test_multi_res_stft_loss_zero_for_identical():
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 4096) * 0.1, jnp.float32)
    sc, mag = multi_resolution_stft_loss(wav, wav)
    assert float(sc) == pytest.approx(0.0, abs=1e-6)
    assert float(mag) == pytest.approx(0.0, abs=1e-6)

    other = wav + 0.05
    sc2, mag2 = multi_resolution_stft_loss(other, wav)
    assert float(sc2) > 0 and float(mag2) > 0
