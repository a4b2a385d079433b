"""A3T task: decoder+postnet masked mel losses.

Parity surface: ``tasks/speech_editing/a3t.py`` (A3TTask.run_model :39-65):
mel losses on ``mel_out_decoder * mask`` (coarse) and
``mel_out_postnet * mask`` (fine); composited output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech_editing_tpu.models.a3t import A3T
from speech_editing_tpu.training.losses import add_mel_loss
from speech_editing_tpu.training.tasks.base import BaseTask


class A3TTask(BaseTask):
    array_batch_keys = ("txt_tokens", "mels", "mel2ph", "time_mel_masks")

    def build_model(self):
        return A3T(vocab_size=self.vocab_size, hp=self.hp,
                   out_dims=self.hp.get("audio_num_mel_bins", 80))

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")

        def loss_fn(params, batch, rng):
            tm = batch["time_mel_masks"][..., None].astype(
                batch["mels"].dtype)  # follow bf16 cast
            out = model.apply({"params": params}, batch["txt_tokens"],
                              batch["mels"], batch["mel2ph"], tm,
                              train=train, rngs={"dropout": rng})
            losses: dict = {}
            add_mel_loss(losses, out["mel_out_decoder"] * tm,
                         batch["mels"] * tm, mel_spec, postfix="_coarse")
            add_mel_loss(losses, out["mel_out_postnet"] * tm,
                         batch["mels"] * tm, mel_spec, postfix="_fine")
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        tm = jnp.asarray(batch["time_mel_masks"])[..., None].astype(jnp.float32)
        return jax.jit(model.init)({"params": rng}, jnp.asarray(batch["txt_tokens"]),
                          jnp.asarray(batch["mels"]),
                          jnp.asarray(batch["mel2ph"]), tm)

    def build_infer_fn(self, model):
        def infer_fn(variables, batch, rng):
            tm = batch["time_mel_masks"][..., None].astype("float32")
            out = model.apply(variables, batch["txt_tokens"], batch["mels"],
                              batch["mel2ph"], tm, infer=True)
            out["mel_out"] = (out["mel_out_postnet"] * tm
                              + batch["mels"] * (1 - tm))
            return out

        return jax.jit(infer_fn)
