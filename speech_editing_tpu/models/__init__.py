"""Model families (flax.linen).

Editing: GaussianDiffusion (FluentSpeech), CampNet, A3T, EditSpeech,
StutterGaussianDiffusion/StutterPredictor. TTS: FastSpeech,
FastSpeech2Orig, DiffSpeech, PortaSpeech(+Flow). Vocoder: HiFi-GAN.
"""

from speech_editing_tpu.models.a3t import A3T
from speech_editing_tpu.models.campnet import CampNet
from speech_editing_tpu.models.diffspeech import DiffSpeech
from speech_editing_tpu.models.editspeech import EditSpeech, bidirectional_fusion
from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.models.fs2_orig import FastSpeech2Orig
from speech_editing_tpu.models.portaspeech import (FVAE, PortaSpeech,
                                                   PortaSpeechFlow)
from speech_editing_tpu.models.spec_denoiser.spec_denoiser import \
    GaussianDiffusion
from speech_editing_tpu.models.stutter_speech import (StutterGaussianDiffusion,
                                                      StutterPredictor)

__all__ = [
    "A3T", "CampNet", "DiffSpeech", "EditSpeech", "bidirectional_fusion",
    "FastSpeech", "FastSpeech2Orig", "FVAE", "PortaSpeech", "PortaSpeechFlow",
    "GaussianDiffusion", "StutterGaussianDiffusion", "StutterPredictor",
]
