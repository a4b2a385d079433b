"""speech_editing_tpu — TPU-native text-based speech editing framework.

JAX/flax rebuild of the Speech-Editing-Toolkit capability surface:
masked-region mel regeneration (diffusion / mask-prediction / conformer /
bi-LSTM editors), NAR TTS baselines, trainable HiFi-GAN vocoder, offline
preprocessing/binarization, region-edit inference, and MCD/STOI/PESQ eval.
"""

__version__ = "0.1.0"
