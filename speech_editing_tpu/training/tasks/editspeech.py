"""EditSpeech task: fwd/bwd masked mel losses + bidirectional fusion.

Parity surface: ``tasks/speech_editing/editspeech.py`` (EditSpeechTask
.run_model :30-60): mel losses on forward and backward decoder outputs in
the masked region, duration loss, fusion splice at inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech_editing_tpu.models.editspeech import EditSpeech, bidirectional_fusion
from speech_editing_tpu.training.losses import (add_mel_loss, dur_loss,
                                                sil_token_mask)
from speech_editing_tpu.training.tasks.base import BaseTask


class EditSpeechTask(BaseTask):
    def build_model(self):
        return EditSpeech(vocab_size=self.vocab_size, hp=self.hp,
                          out_dims=self.hp.get("audio_num_mel_bins", 80))

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
        sil_ids = self.sil_token_ids

        def loss_fn(params, batch, rng):
            k_tf, k_drop = jax.random.split(rng)
            tm = batch["time_mel_masks"][..., None].astype(
                batch["mels"].dtype)  # follow bf16 cast
            out = model.apply(
                {"params": params}, batch["txt_tokens"], tm,
                batch["mel2ph"], batch.get("spk_embed"), batch["mels"],
                batch["f0"], batch["uv"], infer=False, train=train,
                rng=k_tf, rngs={"dropout": k_drop})
            losses: dict = {}
            add_mel_loss(losses, out["forward_outputs"] * tm,
                         batch["mels"] * tm, mel_spec, postfix="_forward")
            add_mel_loss(losses, out["backward_outputs"] * tm,
                         batch["mels"] * tm, mel_spec, postfix="_backward")
            is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
            dur_loss(losses, out["dur"], batch["mel2ph"],
                     batch["txt_tokens"], is_sil, hp)
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        k1, k2 = jax.random.split(rng)
        tm = jnp.asarray(batch["time_mel_masks"])[..., None].astype(jnp.float32)
        return jax.jit(model.init)(
            {"params": k1, "teacher": k2},
            jnp.asarray(batch["txt_tokens"]), tm,
            jnp.asarray(batch["mel2ph"]),
            jnp.asarray(batch["spk_embed"]) if "spk_embed" in batch else None,
            jnp.asarray(batch["mels"]), jnp.asarray(batch["f0"]),
            jnp.asarray(batch["uv"]))

    def build_infer_fn(self, model):
        def infer_fn(variables, batch, rng):
            tm = batch["time_mel_masks"][..., None].astype("float32")
            out = model.apply(
                variables, batch["txt_tokens"], tm, batch["mel2ph"],
                batch.get("spk_embed"), batch["mels"], batch["f0"],
                batch["uv"], infer=True)
            out["mel_out"] = bidirectional_fusion(
                out["forward_outputs"], out["backward_outputs"],
                batch["mels"], tm)
            return out

        return jax.jit(infer_fn)
