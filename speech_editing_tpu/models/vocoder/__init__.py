"""Vocoder models (HiFi-GAN generator, discriminators, spectral losses)."""

from speech_editing_tpu.models.vocoder.hifigan import (
    HifiGanGenerator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    discriminator_loss, feature_loss, generator_loss)
from speech_editing_tpu.models.vocoder.losses import (
    gan_mel_spectrogram, multi_resolution_stft_loss, stft_magnitude)

__all__ = [
    "HifiGanGenerator", "MultiPeriodDiscriminator", "MultiScaleDiscriminator",
    "discriminator_loss", "feature_loss", "generator_loss",
    "gan_mel_spectrogram", "multi_resolution_stft_loss", "stft_magnitude",
]
