"""Plain TTS inference drivers (text -> mel -> wav), no source utterance.

Parity surface: ``inference/tts/ds.py`` (DiffSpeech infer) and the TTS half
of ``inference/tts/base_tts_infer.py`` — the baseline TTS models synthesize
free-running speech with predicted durations and predicted pitch
(``use_pred_mel2ph`` / ``use_pred_pitch``), unlike the editing drivers that
splice into a reference mel.

Usage:
    python -m speech_editing_tpu.infer.tts_infer --config egs/fs.yaml \
        --exp_name fs --text "hello world" [--out out.wav]
Model family is picked from ``task_cls`` (fs / fs2_orig -> FastSpeechInfer,
diffspeech -> DiffSpeechInfer).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from speech_editing_tpu.infer.base_infer import BaseInfer
from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                      txt_to_ph)


class FastSpeechInfer(BaseInfer):
    """FastSpeech / FastSpeech2-orig free-running synthesis."""

    def build_model(self):
        import jax

        from speech_editing_tpu.models.fs import FastSpeech

        model = FastSpeech(self.ph_encoder.vocab_size, self.hp)
        variables = self.load_variables()
        self._infer = jax.jit(
            lambda v, txt, spk: model.apply(
                v, txt, None, None, spk, None, None, infer=True,
                use_pred_mel2ph=True, use_pred_pitch=True))
        return model, variables

    def preprocess_input(self, inp: dict) -> dict:
        txt_processor = get_txt_processor_cls(self.hp.get("language", "en"))
        ph, txt, words, ph2word, _ = txt_to_ph(txt_processor, inp["text"])
        item = {"item_name": inp.get("item_name", "<tts>"), "text": txt,
                "ph_token": np.asarray(self.ph_encoder.encode(ph), np.int64)}
        if self.hp.get("use_spk_embed") and inp.get("ref_wav") is not None:
            item["spk_embed"] = self.spk_embedder(
                np.asarray(inp["ref_wav"], np.float32))
        return item

    def _spk_arg(self, item):
        if "spk_embed" in item:
            return item["spk_embed"][None]
        if self.hp.get("use_spk_embed"):
            return np.zeros((1, 256), np.float32)
        return None

    def forward_model(self, item: dict):
        out = self._infer(self.variables, item["ph_token"][None],
                          self._spk_arg(item))
        mel2ph = np.asarray(out["mel2ph"][0])
        n = int((mel2ph > 0).sum())
        mel = np.asarray(out["mel_out"][0])[:max(n, 1)]
        wav = self.run_vocoder(mel)
        return wav, mel


class FS2OrigInfer(FastSpeechInfer):
    """FastSpeech2-orig (energy + CWT pitch variant): its ``infer=True``
    already implies predicted durations/pitch."""

    def build_model(self):
        import jax

        from speech_editing_tpu.models.fs2_orig import FastSpeech2Orig

        model = FastSpeech2Orig(self.ph_encoder.vocab_size, self.hp)
        variables = self.load_variables()
        self._infer = jax.jit(
            lambda v, txt, spk: model.apply(
                v, txt, None, spk, infer=True))
        return model, variables


class DiffSpeechInfer(FastSpeechInfer):
    """DiffSpeech: epsilon-prediction diffusion decoder over the FastSpeech
    conditioner (reference inference/tts/ds.py)."""

    def build_model(self):
        import jax

        from speech_editing_tpu.models.diffspeech import DiffSpeech

        model = DiffSpeech(self.ph_encoder.vocab_size, self.hp,
                           out_dims=self.hp.get("audio_num_mel_bins", 80))
        variables = self.load_variables()
        self._infer = jax.jit(
            lambda v, txt, spk, rng: model.apply(
                v, txt, None, spk, None, None, None, infer=True, rng=rng))
        return model, variables

    def forward_model(self, item: dict):
        import jax

        out = self._infer(self.variables, item["ph_token"][None],
                          self._spk_arg(item), jax.random.PRNGKey(
                              int(self.hp.get("seed", 1234))))
        mel2ph = np.asarray(out["mel2ph"][0])
        n = int((mel2ph > 0).sum())
        mel = np.asarray(out["mel_out"][0])[:max(n, 1)]
        wav = self.run_vocoder(mel)
        return wav, mel


def infer_cls_for(hp: Any):
    task = hp.get("task_cls", "")
    if re.search(r"diffspeech", task, re.IGNORECASE):
        return DiffSpeechInfer
    if re.search(r"fs2orig|fs2_orig", task, re.IGNORECASE):
        return FS2OrigInfer
    return FastSpeechInfer


def main():
    import argparse

    from speech_editing_tpu.config.hparams import set_hparams
    from speech_editing_tpu.utils.audio.io import save_wav

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", default="tts_out.wav")
    args, rest = ap.parse_known_args()
    import sys

    sys.argv = [sys.argv[0]] + rest
    hp = set_hparams()
    infer_ins = infer_cls_for(hp)(hp)
    wav, mel = infer_ins.infer_once({"text": args.text})
    save_wav(np.asarray(wav, np.float32), args.out,
             int(hp["audio_sample_rate"]))
    print(f"| wrote {args.out} ({len(wav)} samples, {mel.shape[0]} frames)")


if __name__ == "__main__":
    main()
