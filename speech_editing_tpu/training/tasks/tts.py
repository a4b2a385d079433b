"""TTS baseline tasks: FastSpeech, FastSpeech2-orig, DiffSpeech.

Parity surface: ``tasks/tts/fs.py`` (FastSpeechTask.run_model :25-54 — mel
l1/ssim on the full target, dur + pitch losses), ``tasks/tts/fs2_orig.py``
(adds energy and CWT losses), ``tasks/tts/diffspeech.py`` (epsilon-MSE
diffusion loss + dur/pitch). Datasets reuse the editing dataset (masks are
simply not consumed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech_editing_tpu.models.diffspeech import DiffSpeech
from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.models.fs2_orig import FastSpeech2Orig
from speech_editing_tpu.training.losses import (add_mel_loss, dur_loss,
                                                pitch_loss, sil_token_mask)
from speech_editing_tpu.training.tasks.base import BaseTask


def mel_energy(mels: jnp.ndarray) -> jnp.ndarray:
    """Frame energy from log10-mel (FastSpeech2 convention)."""
    return jnp.sqrt(jnp.sum((10.0 ** mels) ** 2, axis=-1) + 1e-8)


class FastSpeechTask(BaseTask):
    array_batch_keys = ("txt_tokens", "mels", "mel2ph", "f0", "uv")

    def build_model(self):
        return FastSpeech(self.vocab_size, self.hp)

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
        sil_ids = self.sil_token_ids
        use_pitch = hp.get("use_pitch_embed", True)

        def loss_fn(params, batch, rng):
            out = model.apply(
                {"params": params}, batch["txt_tokens"],
                mel2ph=batch["mel2ph"], spk_embed=batch.get("spk_embed"),
                f0=batch["f0"], uv=batch["uv"], infer=False, train=train,
                rngs={"dropout": rng})
            losses: dict = {}
            add_mel_loss(losses, out["mel_out"], batch["mels"], mel_spec)
            is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
            dur_loss(losses, out["dur"], batch["mel2ph"],
                     batch["txt_tokens"], is_sil, hp)
            if use_pitch:
                pitch_loss(losses, out["pitch_pred"], batch["f0"],
                           batch["uv"], batch["mel2ph"], hp)
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        return jax.jit(model.init)(
            {"params": rng}, jnp.asarray(batch["txt_tokens"]),
            mel2ph=jnp.asarray(batch["mel2ph"]),
            spk_embed=(jnp.asarray(batch["spk_embed"])
                       if "spk_embed" in batch else None),
            f0=jnp.asarray(batch["f0"]), uv=jnp.asarray(batch["uv"]))

    def build_infer_fn(self, model):
        def infer_fn(variables, batch, rng):
            return model.apply(
                variables, batch["txt_tokens"], mel2ph=batch["mel2ph"],
                spk_embed=batch.get("spk_embed"), f0=batch["f0"],
                uv=batch["uv"], infer=True)

        return jax.jit(infer_fn)


class FastSpeech2OrigTask(FastSpeechTask):
    def build_model(self):
        return FastSpeech2Orig(self.vocab_size, self.hp)

    def effective_batch_keys(self) -> tuple:
        keys = super().effective_batch_keys()
        if (self.hp.get("pitch_type") == "cwt"
                and self.hp.get("use_pitch_embed", True)):
            keys = keys + ("cwt_spec", "f0_mean", "f0_std")
        return keys

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        base_loss = None
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
        sil_ids = self.sil_token_ids
        use_pitch = hp.get("use_pitch_embed", True)
        use_energy = hp.get("use_energy_embed", False)
        cwt = hp.get("pitch_type") == "cwt"

        def loss_fn(params, batch, rng):
            energy = mel_energy(batch["mels"]) if use_energy else None
            out = model.apply(
                {"params": params}, batch["txt_tokens"],
                mel2ph=batch["mel2ph"], spk_embed=batch.get("spk_embed"),
                f0=batch["f0"], uv=batch["uv"],
                energy=energy, infer=False, train=train,
                rngs={"dropout": rng})
            losses: dict = {}
            add_mel_loss(losses, out["mel_out"], batch["mels"], mel_spec)
            is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
            dur_loss(losses, out["dur"], batch["mel2ph"],
                     batch["txt_tokens"], is_sil, hp)
            if use_pitch and cwt:
                # CWT pitch supervision (reference tasks/tts/fs2_orig.py
                # add_pitch_loss cwt branch): spec L1, uv BCE, stats L1
                import optax

                lam_f0 = hp.get("lambda_f0", 1.0)
                t = out["cwt"].shape[1]
                cwt_gt = batch["cwt_spec"][:, :t]
                losses["C"] = jnp.mean(jnp.abs(
                    out["cwt"][:, :cwt_gt.shape[1], :10] - cwt_gt)) * lam_f0
                if hp.get("use_uv", True):
                    nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)
                    uv_logit = out["cwt"][:, :, -1][:, :nonpadding.shape[1]]
                    bce = optax.sigmoid_binary_cross_entropy(
                        uv_logit, batch["uv"][:, :uv_logit.shape[1]])
                    np_t = nonpadding[:, :uv_logit.shape[1]]
                    losses["uv"] = (jnp.sum(bce * np_t)
                                    / jnp.maximum(np_t.sum(), 1.0)
                                    ) * hp.get("lambda_uv", 1.0)
                losses["f0_mean"] = jnp.mean(jnp.abs(
                    out["f0_mean"] - batch["f0_mean"])) * lam_f0
                losses["f0_std"] = jnp.mean(jnp.abs(
                    out["f0_std"] - batch["f0_std"])) * lam_f0
            elif use_pitch:
                pitch_loss(losses, out["pitch_pred"], batch["f0"],
                           batch["uv"], batch["mel2ph"], hp)
            if use_energy:
                nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)
                e_l1 = jnp.abs(out["energy_pred"] - energy)
                losses["e"] = (jnp.sum(e_l1 * nonpadding)
                               / jnp.maximum(nonpadding.sum(), 1.0)
                               ) * hp.get("lambda_energy", 0.1)
            return sum(losses.values()), losses

        return loss_fn


class DiffSpeechTask(FastSpeechTask):
    def build_model(self):
        return DiffSpeech(self.vocab_size, self.hp,
                          out_dims=self.hp.get("audio_num_mel_bins", 80))

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        sil_ids = self.sil_token_ids
        use_pitch = hp.get("use_pitch_embed", True)

        def loss_fn(params, batch, rng):
            k_diff, k_drop = jax.random.split(rng)
            out = model.apply(
                {"params": params}, batch["txt_tokens"],
                mel2ph=batch["mel2ph"], spk_embed=batch.get("spk_embed"),
                ref_mels=batch["mels"], f0=batch["f0"], uv=batch["uv"],
                infer=False, rng=k_diff, train=train,
                rngs={"dropout": k_drop})
            losses: dict = {}
            nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)[:, :, None]
            diff = jnp.abs(out["noise_pred"] - out["noise_gt"])
            losses["diff"] = (jnp.sum(diff * nonpadding)
                              / jnp.maximum(nonpadding.sum() * diff.shape[-1], 1.0))
            is_sil = sil_token_mask(batch["txt_tokens"], sil_ids)
            dur_loss(losses, out["dur"], batch["mel2ph"],
                     batch["txt_tokens"], is_sil, hp)
            if use_pitch:
                pitch_loss(losses, out["pitch_pred"], batch["f0"],
                           batch["uv"], batch["mel2ph"], hp)
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        k1, k2 = jax.random.split(rng)
        return jax.jit(model.init)(
            {"params": k1, "diffusion": k2},
            jnp.asarray(batch["txt_tokens"]),
            mel2ph=jnp.asarray(batch["mel2ph"]),
            spk_embed=(jnp.asarray(batch["spk_embed"])
                       if "spk_embed" in batch else None),
            ref_mels=jnp.asarray(batch["mels"]),
            f0=jnp.asarray(batch["f0"]), uv=jnp.asarray(batch["uv"]))

    def build_infer_fn(self, model):
        """Reverse diffusion as ONE lax.scan over T steps (T=100 in the
        DiffSpeech config — unrolling would explode compile time)."""
        from speech_editing_tpu.ops.diffusion import (DiffusionSchedule,
                                                      p_sample_loop)

        hp = self.hp
        sched = DiffusionSchedule.create(
            schedule_type=hp.get("schedule_type", "cosine"),
            timesteps=hp["timesteps"], time_scale=hp.get("timescale", 1),
            max_beta=hp.get("max_beta", 0.06))
        out_dims = hp.get("audio_num_mel_bins", 80)
        import numpy as np
        # host numpy (NOT device arrays): these are closed over by the
        # jitted sampler — device-array closures poison dispatch (CLAUDE.md)
        spec_min = np.asarray(
            (np.asarray(hp.get("spec_min") or [-6.0] * out_dims))[:out_dims],
            np.float32)
        spec_max = np.asarray(
            (np.asarray(hp.get("spec_max") or [1.5] * out_dims))[:out_dims],
            np.float32)

        def infer_fn(variables, batch, rng):
            ret = model.apply(
                variables, batch["txt_tokens"], mel2ph=batch["mel2ph"],
                spk_embed=batch.get("spk_embed"), f0=batch["f0"],
                uv=batch["uv"], method=DiffSpeech.compute_cond)
            cond = ret["decoder_inp"]
            tgt_nonpadding = (ret["mel2ph"] > 0)[:, :, None].astype(jnp.float32)

            def denoise_x0(x_t, t, c):
                eps = model.apply(variables, x_t, t, c,
                                  method=DiffSpeech.denoise)
                sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod)[t].reshape(-1, 1, 1)
                sqrt_om = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)[t].reshape(-1, 1, 1)
                return jnp.clip((x_t - sqrt_om * eps)
                                / jnp.maximum(sqrt_ac, 1e-8), -1, 1)

            shape = (cond.shape[0], cond.shape[1], out_dims)
            x = p_sample_loop(sched, denoise_x0, cond, shape, rng)
            mel = (x + 1) / 2 * (spec_max - spec_min) + spec_min
            ret["mel_out"] = mel * tgt_nonpadding
            return ret

        return jax.jit(infer_fn)
