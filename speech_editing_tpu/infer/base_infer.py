"""Base inference driver (model + vocoder + spk-embed assembly).

Parity surface: ``inference/tts/base_tts_infer.py`` — builds the acoustic
model from ``work_dir`` checkpoints and the vocoder from ``vocoder_ckpt``;
``infer_once = preprocess -> forward -> postprocess`` (:95-99).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


class BaseInfer:
    def __init__(self, hp: Any):
        self.hp = hp
        self.data_dir = hp["binary_data_dir"]
        self.ph_encoder = self._load_encoder()
        self.model, self.variables = self.build_model()
        self.vocoder = self.build_vocoder()
        self.spk_embedder = self._build_spk_embedder()

    def _load_encoder(self):
        from speech_editing_tpu.utils.text.text_encoder import build_token_encoder

        for d in (self.data_dir, self.hp.get("processed_data_dir", "")):
            fn = os.path.join(d, "phone_set.json") if d else ""
            if fn and os.path.exists(fn):
                return build_token_encoder(fn)
        raise FileNotFoundError(
            f"phone_set.json not found under {self.data_dir}")

    def build_model(self):
        raise NotImplementedError

    def load_variables(self, state_or_none=None):
        """Last checkpoint from work_dir -> {'params': ...}."""
        from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                            load_checkpoint)

        ckpt_path, steps = get_last_checkpoint(self.hp["work_dir"])
        assert ckpt_path is not None, f"no checkpoint in {self.hp['work_dir']}"
        payload = load_checkpoint(ckpt_path)
        state = payload["state"]
        params = state.params if hasattr(state, "params") else state["params"]
        print(f"| loaded {ckpt_path} (step {payload['steps']})")
        return {"params": params}

    def maybe_quantize(self, variables):
        """``hp['serve_quant_int8']``: weight-only int8 for the serving
        programs (infer/quant.py). Returns (variables, deq) where ``deq``
        is applied INSIDE the jitted program — identity when the flag is
        off, so every family's build_model routes through here."""
        if not self.hp.get("serve_quant_int8"):
            return variables, lambda v: v
        from speech_editing_tpu.infer.quant import (dequantize_tree,
                                                    max_quant_error,
                                                    quantize_tree)

        q = quantize_tree(variables["params"],
                          min_size=int(self.hp.get("quant_min_size", 4096)))
        print(f"| int8 weight-only serving: max quant err "
              f"{max_quant_error(variables['params'], q):.2e}")
        return {"params": q}, dequantize_tree

    def build_vocoder(self):
        from speech_editing_tpu.infer.vocoder import get_vocoder_cls

        return get_vocoder_cls(self.hp.get("vocoder", "GriffinLim"))(self.hp)

    def _build_spk_embedder(self):
        try:
            from resemblyzer import VoiceEncoder  # type: ignore

            enc = VoiceEncoder(device="cpu")
            return lambda wav: np.asarray(
                enc.embed_utterance(wav.astype(np.float64)), np.float32)
        except Exception:
            return lambda wav: np.zeros(256, np.float32)

    def run_vocoder(self, mel: np.ndarray) -> np.ndarray:
        return self.vocoder.spec2wav(np.asarray(mel))

    # -- pipeline -------------------------------------------------------------
    def preprocess_input(self, inp: dict) -> dict:
        raise NotImplementedError

    def forward_model(self, item: dict):
        raise NotImplementedError

    def infer_once(self, inp: dict):
        return self.forward_model(self.preprocess_input(inp))
