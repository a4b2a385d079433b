"""Region-edit inference drivers for CampNet / A3T / EditSpeech.

Parity surface: ``inference/tts/campnet.py`` / ``a3t.py`` /
``editspeech.py`` — the same CSV driver skeleton as the FluentSpeech path
but with in-place regeneration: these models keep the original frame grid
and re-predict only the masked span (EditSpeech additionally runs the
bidirectional fusion splice).

The word-region -> frame-mask resolution reuses the FluentSpeech
preprocessing (g2p + TextGrid/precomputed mel2ph + region parsing).
"""

from __future__ import annotations

import numpy as np

from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer


class _InPlaceEditInfer(SpecDenoiserInfer):
    """Shared flow: frame mask over the edit region, same-length regen.

    Subclasses implement ``_model_mel_out_batch`` — a BATCHED device
    forward with the uniform signature (txt, mels, mel2ph, tm, spk, f0,
    uv), each ``[B, ...]``, returning the predicted mel ``[B, T, 80]``
    as a DEVICE array (the serving engine composites on device and
    chains it into a device vocoder without a host round trip; host
    consumers ``np.asarray`` it) — used both by the per-item path below
    (B=1) and by the batched serving engine
    (``infer.serving.BatchedInPlaceEditServer``)."""

    # token sequence driving the model (in-place models keep the original
    # frame grid; CampNet conditions on the EDITED phonemes)
    _token_field = "ph_token"

    @classmethod
    def make_server(cls, infer_ins, **kw):
        from speech_editing_tpu.infer.serving import BatchedInPlaceEditServer

        return BatchedInPlaceEditServer(infer_ins, **kw)

    def _frame_mask(self, item) -> np.ndarray:
        w0, w1 = item["words_region"][0]
        mel2word = item["mel2word"]
        return ((mel2word >= w0) & (mel2word <= w1)).astype(np.float32)

    def _model_mel_out_batch(self, txt, mels, mel2ph, tm, spk, f0, uv
                             ) -> np.ndarray:
        raise NotImplementedError

    def _model_mel_out(self, item, tm, spk_embed):
        return np.asarray(self._model_mel_out_batch(
            item[self._token_field][None], item["mel"][None],
            item["mel2ph"][None], tm[None], spk_embed,
            item["f0"][None], item["uv"][None]), np.float32)[0]

    def forward_model(self, item):
        tm = self._frame_mask(item)[:, None]  # [T, 1]
        spk_embed = self.spk_embedder(item["wav"])[None]
        mel_out = self._model_mel_out(item, tm, spk_embed)
        mel_out = mel_out * tm + item["mel"] * (1 - tm)
        wav_out = self.run_vocoder(mel_out)
        wav_gt = self.run_vocoder(item["mel"])
        masked_mel_gt = item["mel"] * tm
        return wav_out, wav_gt, mel_out, item["mel"], mel_out * tm, masked_mel_gt


class CampNetInfer(_InPlaceEditInfer):
    _token_field = "edited_ph_token"

    def build_model(self):
        import jax

        from speech_editing_tpu.models.campnet import CampNet

        model = CampNet(vocab_size=self.ph_encoder.vocab_size, hp=self.hp,
                        out_dims=self.hp.get("audio_num_mel_bins", 80))
        variables, deq = self.maybe_quantize(self.load_variables())
        self._infer = jax.jit(
            lambda v, txt, mels, tm: model.apply(deq(v), txt, mels, tm,
                                                 infer=True))
        return model, variables

    def _model_mel_out_batch(self, txt, mels, mel2ph, tm, spk, f0, uv):
        import jax.numpy as jnp

        out = self._infer(self.variables, jnp.asarray(txt),
                          jnp.asarray(mels), jnp.asarray(tm))
        return out["mel_out_fine"]


class A3TInfer(_InPlaceEditInfer):
    def build_model(self):
        import jax

        from speech_editing_tpu.models.a3t import A3T

        model = A3T(vocab_size=self.ph_encoder.vocab_size, hp=self.hp,
                    out_dims=self.hp.get("audio_num_mel_bins", 80))
        variables, deq = self.maybe_quantize(self.load_variables())
        self._infer = jax.jit(
            lambda v, txt, mels, m2p, tm: model.apply(
                deq(v), txt, mels, m2p, tm, infer=True))
        return model, variables

    def _model_mel_out_batch(self, txt, mels, mel2ph, tm, spk, f0, uv):
        import jax.numpy as jnp

        out = self._infer(self.variables, jnp.asarray(txt),
                          jnp.asarray(mels), jnp.asarray(mel2ph),
                          jnp.asarray(tm))
        return out["mel_out_postnet"]


class EditSpeechInfer(_InPlaceEditInfer):
    def build_model(self):
        import jax

        from speech_editing_tpu.models.editspeech import EditSpeech

        model = EditSpeech(vocab_size=self.ph_encoder.vocab_size, hp=self.hp,
                           out_dims=self.hp.get("audio_num_mel_bins", 80))
        variables, deq = self.maybe_quantize(self.load_variables())
        self._infer = jax.jit(
            lambda v, txt, tm, m2p, spk, mels, f0, uv: model.apply(
                deq(v), txt, tm, m2p, spk, mels, f0, uv, infer=True))
        return model, variables

    def _model_mel_out_batch(self, txt, mels, mel2ph, tm, spk, f0, uv):
        import jax.numpy as jnp

        from speech_editing_tpu.models.editspeech import bidirectional_fusion

        out = self._infer(self.variables, jnp.asarray(txt),
                          jnp.asarray(tm), jnp.asarray(mel2ph),
                          jnp.asarray(spk), jnp.asarray(mels),
                          jnp.asarray(f0), jnp.asarray(uv))
        return bidirectional_fusion(
            out["forward_outputs"], out["backward_outputs"],
            jnp.asarray(mels), jnp.asarray(tm))


INFER_BY_TASK = {
    "campnet": CampNetInfer,
    "a3t": A3TInfer,
    "editspeech": EditSpeechInfer,
}


def infer_cls_for_hp(hp) -> type:
    """Pick the editor driver from the config's ``task_cls`` (the reference
    ships one script per model, ``inference/tts/{campnet,a3t,editspeech}.py``;
    here one CLI dispatches on the experiment's task)."""
    task_cls = str(hp.get("task_cls", "")).lower()
    for key, cls in INFER_BY_TASK.items():
        if key in task_cls:
            return cls
    raise SystemExit(
        f"cannot infer editor from task_cls={hp.get('task_cls')!r}; "
        f"expected one of {sorted(INFER_BY_TASK)}")


if __name__ == "__main__":
    from speech_editing_tpu.config.hparams import set_hparams
    from speech_editing_tpu.infer.spec_denoiser import (data_preprocess,
                                                        load_dataset_info)

    hp = set_hparams()
    cls = infer_cls_for_hp(hp)
    test_file_path = hp.get("infer_csv", "inference/example.csv")
    dataset_info = data_preprocess(
        test_file_path, "inference/audio",
        hp.get("mfa_dict", "data/processed/libritts/mfa_dict.txt"),
        hp.get("mfa_model", "data/processed/libritts/mfa_model.zip"),
        "inference/audio/mfa_out", align=bool(hp.get("mfa_align", True)))
    cls.example_run(dataset_info, hp)
