"""Vocoder inference registry (mel -> wav).

Parity surface: ``tasks/tts/vocoder_infer/base_vocoder.py`` (@register_vocoder
:6-18) and ``hifigan.py`` (HifiGAN.spec2wav :23-31). A vocoder class exposes
``spec2wav(mel [T,80]) -> wav [N]``; the registry is selected by
``hp['vocoder']``. GriffinLim is the dependency-free fallback when no
trained vocoder checkpoint is available.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

VOCODERS: dict = {}


def register_vocoder(name: Optional[str] = None):
    def wrap(cls):
        VOCODERS[(name or cls.__name__).lower()] = cls
        return cls
    return wrap


def get_vocoder_cls(name: str):
    return VOCODERS[name.lower()]


class BaseVocoder:
    #: True when spec2wav_batch is ONE device program needing static shapes
    #: (the serving engine then feeds full padded buckets; host vocoders
    #: get only the real rows).
    device_batched = False

    def spec2wav(self, mel: np.ndarray, **kw) -> np.ndarray:
        raise NotImplementedError

    def spec2wav_batch(self, mels: np.ndarray, **kw) -> np.ndarray:
        """Batched mel [B,T,80] -> wav [B,N]. Default: per-item loop (host
        vocoders); device vocoders override with one batched XLA program."""
        return np.stack([self.spec2wav(m, **kw) for m in np.asarray(mels)])


@register_vocoder("GriffinLim")
class GriffinLim(BaseVocoder):
    def __init__(self, hp):
        self.hp = hp

    def spec2wav(self, mel: np.ndarray, **kw) -> np.ndarray:
        from speech_editing_tpu.utils.audio.griffin_lim import mel2wav_griffin_lim
        hp = self.hp
        return mel2wav_griffin_lim(
            np.asarray(mel), sample_rate=hp["audio_sample_rate"],
            n_fft=hp["fft_size"], hop_size=hp["hop_size"],
            num_mels=hp["audio_num_mel_bins"], fmin=hp["fmin"], fmax=hp["fmax"])


@register_vocoder("HifiGAN")
class HifiGAN(BaseVocoder):
    """Loads a trained flax HiFi-GAN checkpoint from ``hp['vocoder_ckpt']``
    (directory with our ``model_ckpt_steps_*.ckpt`` + ``config.yaml``).
    Falls back to Griffin-Lim when the checkpoint is absent so that
    validation/test keep producing audio on fresh setups."""

    def __init__(self, hp):
        import yaml

        self.hp = hp
        self._apply = None
        self._fallback = None
        ckpt_dir = hp.get("vocoder_ckpt", "")
        config_path = os.path.join(ckpt_dir, "config.yaml") if ckpt_dir else ""
        from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                            load_checkpoint)
        ckpt_path, _ = get_last_checkpoint(ckpt_dir) if ckpt_dir and os.path.isdir(ckpt_dir) else (None, 0)
        if ckpt_path and os.path.exists(config_path):
            import jax
            import jax.numpy as jnp

            from speech_editing_tpu.models.vocoder import HifiGanGenerator

            with open(config_path) as f:
                vhp = yaml.safe_load(f)
            payload = load_checkpoint(ckpt_path)
            state = payload["state"]
            if hasattr(state, "gen_params"):  # GanTrainState checkpoint
                params = state.gen_params
            else:
                params = (state.params if hasattr(state, "params")
                          else state["params"])
                if "gen" in params and "disc" in params:
                    params = params["gen"]
            gen = HifiGanGenerator(hp=vhp)
            if hp.get("serve_quant_int8"):
                # weight-only int8 (infer/quant.py): HiFi-GAN is
                # HBM-bound (BASELINE.md roofline), so halved weight
                # reads are the one lever that doesn't change the model
                from speech_editing_tpu.infer.quant import (dequantize_tree,
                                                            quantize_tree)

                params = quantize_tree(
                    params, min_size=int(hp.get("quant_min_size", 4096)))
                apply_jit = jax.jit(
                    lambda p, m: gen.apply({"params": dequantize_tree(p)}, m))
            else:
                apply_jit = jax.jit(lambda p, m: gen.apply({"params": p}, m))

            def run(mel):
                return np.asarray(apply_jit(params, jnp.asarray(mel[None], jnp.float32)))[0]

            def run_batch(mels):  # [B,T,80] in ONE device program
                return np.asarray(
                    apply_jit(params, jnp.asarray(mels, jnp.float32)))

            def run_batch_dev(mels_dev):  # device in -> device out, no fetch
                return apply_jit(params, mels_dev)

            self._apply = run
            self._apply_batch = run_batch
            self._apply_batch_dev = run_batch_dev
            self.device_batched = True
        else:
            self._fallback = GriffinLim(hp)

    def spec2wav(self, mel: np.ndarray, **kw) -> np.ndarray:
        if self._apply is not None:
            return self._apply(np.asarray(mel, np.float32))
        return self._fallback.spec2wav(mel, **kw)

    def spec2wav_batch(self, mels: np.ndarray, **kw) -> np.ndarray:
        if self._apply is not None:
            return self._apply_batch(np.asarray(mels, np.float32))
        return self._fallback.spec2wav_batch(mels, **kw)

    def spec2wav_batch_dev(self, mels_dev):
        """Device->device batched vocode: the jit output WITHOUT a host
        fetch, so servers can chain device-side post-processing (int16 PCM
        conversion) and fetch the wav buffer once. On a network-attached
        chip ``np.asarray`` round trips through the tunnel — the plain
        ``spec2wav_batch(device_array)`` path was measured moving an extra
        ~10 MB per T=1024xB=16 chunk (fetch f32 composite + re-upload).
        Only valid when ``device_batched``."""
        assert self._apply is not None
        return self._apply_batch_dev(mels_dev)
