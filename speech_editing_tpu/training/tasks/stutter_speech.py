"""StutterSpeech tasks: stutter-conditioned diffusion + standalone predictor.

Parity surface:

* :class:`StutterSpeechTask` — ``tasks/speech_editing/stutter_speech.py``
  (run_model :57-97): stutter labels collapsed to {0,1,2(pad)}, masked mel
  loss + dur + pitch + CE/focal stutter losses with annealed CE weight
  (:99-106: ce_w = 8e-3 + 5e-3*(step+1)/100k);
* :class:`StutterPredictorTask` — ``tasks/speech_editing/stutter_predictor.py``
  (:97-158): block-level CE (weight annealed min(1e-2, 1e-2*6000/step)) +
  focal loss; val metrics acc (fluent+stutter correct over all) and acc_1
  (stutter recall).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech_editing_tpu.models.stutter_speech import (StutterGaussianDiffusion,
                                                      StutterPredictor)
from speech_editing_tpu.training.losses import (add_mel_loss,
                                                cross_entropy_loss, dur_loss,
                                                multi_focal_loss, pitch_loss,
                                                sil_token_mask)
from speech_editing_tpu.training.tasks.base import BaseTask


def collapse_stutter_labels(stutter_mel_masks):
    """{>0 -> 1 (stutter), <0 -> 2 (pad), 0 -> 0 (fluent)}."""
    s = stutter_mel_masks
    return jnp.where(s > 0, 1, jnp.where(s < 0, 2, 0)).astype(jnp.int32)


class StutterSpeechTask(BaseTask):
    array_batch_keys = ("txt_tokens", "mels", "mel2ph", "f0", "uv",
                        "time_mel_masks", "stutter_mel_masks")

    def build_model(self):
        return StutterGaussianDiffusion(
            vocab_size=self.vocab_size, hp=self.hp,
            out_dims=self.hp.get("audio_num_mel_bins", 80))

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
        sil_ids = self.sil_token_ids
        use_pitch = hp.get("use_pitch_embed", True)

        def loss_fn(params, batch, rng):
            k_diff, k_drop = jax.random.split(rng)
            tm = batch["time_mel_masks"][..., None].astype(
                batch["mels"].dtype)  # follow bf16 cast
            labels = collapse_stutter_labels(batch["stutter_mel_masks"])
            out = model.apply(
                {"params": params}, batch["txt_tokens"], tm, labels,
                batch["mel2ph"], batch.get("spk_embed"), batch["mels"],
                batch["f0"], batch["uv"], infer=False, rng=k_diff,
                train=train, rngs={"dropout": k_drop})
            losses: dict = {}
            add_mel_loss(losses, out["mel_out"] * tm, batch["mels"] * tm,
                         mel_spec, postfix="_coarse")
            is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
            dur_loss(losses, out["dur"], batch["mel2ph"],
                     batch["txt_tokens"], is_sil, hp)
            if use_pitch:
                pitch_loss(losses, out["pitch_pred"], batch["f0"],
                           batch["uv"], batch["mel2ph"], hp)
            sp_out = out["stutter_predictor_out"]
            # annealed CE weight (reference stutter_speech.py:99-106)
            step = batch.get("global_step", jnp.asarray(0.0))
            ce_w = 8e-3 + 5e-3 * (step + 1.0) / 100000.0
            losses["ce"] = cross_entropy_loss(sp_out, labels) * ce_w
            losses["focal"] = multi_focal_loss(sp_out, labels)
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        k1, k2 = jax.random.split(rng)
        tm = jnp.asarray(batch["time_mel_masks"])[..., None].astype(jnp.float32)
        labels = collapse_stutter_labels(jnp.asarray(batch["stutter_mel_masks"]))
        return jax.jit(model.init)(
            {"params": k1, "diffusion": k2},
            jnp.asarray(batch["txt_tokens"]), tm, labels,
            jnp.asarray(batch["mel2ph"]),
            jnp.asarray(batch["spk_embed"]) if "spk_embed" in batch else None,
            jnp.asarray(batch["mels"]), jnp.asarray(batch["f0"]),
            jnp.asarray(batch["uv"]))

    def build_infer_fn(self, model):
        def infer_fn(variables, batch, rng):
            tm = batch["time_mel_masks"][..., None].astype("float32")
            labels = collapse_stutter_labels(batch["stutter_mel_masks"])
            out = model.apply(
                variables, batch["txt_tokens"], tm, labels, batch["mel2ph"],
                batch.get("spk_embed"), batch["mels"], batch["f0"],
                batch["uv"], infer=True, rng=rng)
            out["mel_out"] = out["mel_out"] * tm + batch["mels"] * (1 - tm)
            return out

        return jax.jit(infer_fn)


class StutterPredictorTask(BaseTask):
    array_batch_keys = ("txt_tokens", "mels", "mel2ph", "stutter_mel_masks")
    block_size = 16

    def build_model(self):
        return StutterPredictor(vocab_size=self.vocab_size, hp=self.hp,
                                block_size=self.hp.get("stutter_block_size", 16))

    def _block_labels(self, stutter_mel_masks):
        """Frame labels -> block labels: any stutter frame marks the block
        (reference run_model :104-112)."""
        b, t = stutter_mel_masks.shape
        bs = self.hp.get("stutter_block_size", 16)
        blk = stutter_mel_masks.reshape(b, t // bs, bs).sum(-1)
        return jnp.where(blk > 0, 1, jnp.where(blk < 0, 2, 0)).astype(jnp.int32)

    def make_loss_fn(self, model, train: bool = True):
        def loss_fn(params, batch, rng):
            labels = self._block_labels(batch["stutter_mel_masks"])
            out = model.apply({"params": params}, batch["txt_tokens"],
                              batch["mels"], batch["mel2ph"], train=train,
                              rngs={"dropout": rng})
            logits = out["logits"]
            # decaying CE weight min(1e-2, 1e-2*6000/step)
            # (reference stutter_predictor.py:131-134)
            step = batch.get("global_step", jnp.asarray(1.0))
            ce_w = jnp.minimum(1e-2, 1e-2 * 6000.0 / jnp.maximum(step, 1.0))
            losses = {
                "ce": cross_entropy_loss(logits, labels) * ce_w,
                "focal": multi_focal_loss(logits, labels),
            }
            # val metrics (cheap; computed in the same program)
            pred = jnp.argmax(logits, axis=-1)
            correct = ((pred == labels) & (pred <= 1)).sum()
            losses["acc"] = correct / labels.size
            stutter_n = jnp.maximum((labels == 1).sum(), 1)
            losses["acc_1"] = ((pred == 1) & (labels == 1)).sum() / stutter_n
            total = losses["ce"] + losses["focal"]
            return total, losses

        return loss_fn

    def init_model(self, model, batch, rng):
        variables = jax.jit(model.init)(
            {"params": rng}, jnp.asarray(batch["txt_tokens"]),
            jnp.asarray(batch["mels"]), jnp.asarray(batch["mel2ph"]))
        wd = self.hp.get("spec_denoiser_work_dir")
        if wd:
            variables = self.warm_start_text_encoder(variables, wd)
        return variables

    def warm_start_text_encoder(self, variables, work_dir_or_ckpt: str):
        """Copy the pretrained spec_denoiser ``fs.encoder`` params into this
        predictor's ``txt_encoder`` — the reference does this unconditionally
        at build time (``tasks/speech_editing/stutter_predictor.py:84-90``,
        key rename ``fs.encoder`` -> ``txt_encoder``). Gated here on
        ``spec_denoiser_work_dir`` (the reference's config key) so synthetic
        unit runs without a pretrained denoiser still work."""
        import numpy as np

        from speech_editing_tpu.training.checkpoint import (
            get_last_checkpoint, load_subtree)

        path = work_dir_or_ckpt
        if not path.endswith(".ckpt"):
            path, _ = get_last_checkpoint(work_dir_or_ckpt)
            if path is None:
                raise FileNotFoundError(
                    "spec_denoiser_work_dir has no checkpoint: "
                    f"{work_dir_or_ckpt}")
        enc = load_subtree(path, "fs/encoder")
        cur = variables["params"]["txt_encoder"]
        flat_new, td_new = jax.tree.flatten(enc)
        flat_cur, td_cur = jax.tree.flatten(cur)
        if td_new != td_cur:
            raise ValueError(
                "pretrained fs.encoder tree does not match txt_encoder "
                "(encoder_type must match the denoiser's): "
                f"\n saved={td_new}\n want={td_cur}")
        for a, b in zip(flat_cur, flat_new):
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                raise ValueError(f"warm-start shape mismatch "
                                 f"{np.shape(a)} vs {np.shape(b)}")
        params = dict(variables["params"])
        params["txt_encoder"] = jax.tree.map(jnp.asarray, enc)
        print(f"| warm-started txt_encoder <- {path}:fs/encoder")
        return {**variables, "params": params}

    def build_infer_fn(self, model):
        def infer_fn(variables, batch, rng):
            out = model.apply(variables, batch["txt_tokens"], batch["mels"],
                              batch["mel2ph"], infer=True)
            out["stutter_pred"] = jnp.argmax(out["logits"], axis=-1)
            out["mel_out"] = batch["mels"]
            return out

        return jax.jit(infer_fn)
