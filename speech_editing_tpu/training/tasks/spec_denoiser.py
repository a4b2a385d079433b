"""FluentSpeech (spec_denoiser) task: loss assembly + model builder.

Capability parity with ``tasks/speech_editing/spec_denoiser.py``
(SpeechDenoiserTask.run_model :39-62): masked-region mel losses
(l1+ssim on ``mel_out * mask`` vs ``target * mask``), duration losses,
pitch loss; the inference output is composited with ground truth outside
the mask at the call site.

The loss is a pure function ``loss_fn(params, batch, rng)`` suitable for
``make_train_step`` — the task object (dataloaders, checkpoints, plots)
lives in the trainer layer.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from speech_editing_tpu.models.spec_denoiser.spec_denoiser import GaussianDiffusion
from speech_editing_tpu.training.losses import (add_mel_loss, dur_loss,
                                                pitch_loss, sil_token_mask)
from speech_editing_tpu.training.tasks.base import BaseTask


def build_model(vocab_size: int, hp: Any) -> GaussianDiffusion:
    return GaussianDiffusion(vocab_size=vocab_size, hp=hp,
                             out_dims=hp.get("audio_num_mel_bins", 80))


def make_loss_fn(model: GaussianDiffusion, hp: Any,
                 sil_token_ids: Sequence[int] = (), train: bool = True):
    """Training loss closure. Batch keys (reference collate,
    ``tasks/speech_editing/dataset_utils.py:148-170``): txt_tokens [B,S],
    mels [B,T,80], mel2ph [B,T], f0 [B,T], uv [B,T], time_mel_masks [B,T],
    optional spk_embed [B,256]."""
    mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
    use_pitch = hp.get("use_pitch_embed", True)
    sil_ids = tuple(sil_token_ids)

    def loss_fn(params, batch, rng):
        k_diff, k_drop = jax.random.split(rng)
        tm = batch["time_mel_masks"][..., None].astype(
                batch["mels"].dtype)  # follow bf16 cast
        out = model.apply(
            {"params": params}, batch["txt_tokens"], tm, batch["mel2ph"],
            batch.get("spk_embed"), batch["mels"], batch["f0"], batch["uv"],
            infer=False, rng=k_diff, train=train, rngs={"dropout": k_drop})
        losses: dict = {}
        add_mel_loss(losses, out["mel_out"] * tm, batch["mels"] * tm,
                     mel_spec, postfix="_coarse")
        is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
        dur_loss(losses, out["dur"], batch["mel2ph"], batch["txt_tokens"],
                 is_sil, hp)
        if use_pitch:
            pitch_loss(losses, out["pitch_pred"], batch["f0"], batch["uv"],
                       batch["mel2ph"], hp)
        total = sum(losses.values())
        return total, losses

    return loss_fn


class SpecDenoiserTask(BaseTask):
    """FluentSpeech diffusion editing task
    (reference SpeechDenoiserTask, tasks/speech_editing/spec_denoiser.py)."""

    def build_model(self):
        return build_model(self.vocab_size, self.hp)

    def make_loss_fn(self, model, train: bool = True):
        return make_loss_fn(model, self.hp, sil_token_ids=self.sil_token_ids,
                            train=train)
