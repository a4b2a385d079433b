"""Adversarial PortaSpeech: VAE TTS + multi-window mel discriminator.

Parity surface: ``tasks/tts/ps_adv.py`` — generator losses = PortaSpeech
losses (mel, KL, word dur) + LSGAN adversarial on multi-window mel clips
scaled by ``lambda_mel_adv`` (:0.05); discriminator = LSGAN real/fake over
the same windows (windows shared between the two passes via start_frames).
One fused jitted step updates both (same pattern as the vocoder GAN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from speech_editing_tpu.modules.multi_window_disc import MultiWindowDiscriminator
from speech_editing_tpu.training.optim import build_optimizer
from speech_editing_tpu.training.tasks.hifigan import GanTrainState
from speech_editing_tpu.training.tasks.portaspeech import PortaSpeechTask


class PortaSpeechAdvTask(PortaSpeechTask):
    is_gan = True

    def build_discriminators(self):
        hp = self.hp
        win_num = int(hp.get("disc_win_num", 3))
        return MultiWindowDiscriminator(
            time_lengths=tuple([32, 64, 128][:win_num]),
            freq_length=hp.get("audio_num_mel_bins", 80),
            hidden_size=hp.get("mel_disc_hidden_size", 128))

    def init_gan_state(self, model, disc, batch, rng):
        k_g, k_d = jax.random.split(rng)
        gen_vars = self.init_model(model, batch, k_g)
        mels = jnp.asarray(batch["mels"])
        x_len = jnp.asarray((batch["mel2word"] > 0).sum(-1))
        disc_params = jax.jit(disc.init)(
            k_d, mels, x_len, rng=jax.random.PRNGKey(0))["params"]
        self.gen_tx = build_optimizer(self.hp)
        disc_hp = dict(self.hp)
        disc_hp["lr"] = self.hp.get("disc_lr", self.hp["lr"])
        self.disc_tx = build_optimizer(disc_hp)
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_vars["params"],
            gen_opt=self.gen_tx.init(gen_vars["params"]),
            disc_params=disc_params,
            disc_opt=self.disc_tx.init(disc_params))

    def make_gan_train_step(self, model, disc, mesh=None):
        hp = self.hp
        base_loss_fn_builder = super().make_loss_fn
        lambda_adv = float(hp.get("lambda_mel_adv", 0.05))
        disc_start = int(hp.get("disc_start_steps", 0))
        gen_tx, disc_tx = self.gen_tx, self.disc_tx

        def gen_loss_fn(gen_params, disc_params, batch, rng):
            k_vae, k_drop, k_win = jax.random.split(rng, 3)
            out = self._apply_train(model, gen_params, batch, rng=k_vae,
                                    k_drop=k_drop)
            losses: dict = {}
            from speech_editing_tpu.training.losses import add_mel_loss
            from speech_editing_tpu.ops.seq_ops import mel2token_to_dur

            t = out["mel_out"].shape[1]
            add_mel_loss(losses, out["mel_out"], batch["mels"][:, :t],
                         hp.get("mel_losses", "l1:0.5|ssim:0.5"))
            losses["kl"] = (jnp.maximum(out["kl"], hp.get("kl_min", 0.0))
                            * hp.get("lambda_kl", 1.0))
            word_np = (batch["word_tokens"] != 0).astype(jnp.float32)
            dur_gt = mel2token_to_dur(
                batch["mel2word"], batch["word_tokens"].shape[1]
            ).astype(jnp.float32) * word_np
            wdur = (jnp.log1p(out["dur"]) - jnp.log1p(dur_gt)) ** 2
            losses["wdur"] = (jnp.sum(wdur * word_np)
                              / jnp.maximum(word_np.sum(), 1.0))
            x_len = (batch["mel2word"][:, :t] > 0).sum(-1)
            d_fake = disc.apply({"params": disc_params}, out["mel_out"],
                                x_len, rng=k_win)
            # reference configs either enable adv from step 0 or set
            # disc_start_steps huge to disable it — resolved statically
            adv_scale = lambda_adv if disc_start == 0 else 0.0
            losses["adv"] = jnp.mean((d_fake["y"] - 1.0) ** 2) * adv_scale
            total = sum(losses.values())
            return total, (losses, out["mel_out"], x_len,
                           d_fake["start_frames"])

        def disc_loss_fn(disc_params, mels_gt, mel_fake, x_len, starts):
            d_real = disc.apply({"params": disc_params}, mels_gt, x_len,
                                start_frames=starts)
            d_fake = disc.apply({"params": disc_params}, mel_fake, x_len,
                                start_frames=starts)
            losses = {
                "disc_real": jnp.mean((d_real["y"] - 1.0) ** 2),
                "disc_fake": jnp.mean(d_fake["y"] ** 2),
            }
            return losses["disc_real"] + losses["disc_fake"], losses

        def step_fn(state: GanTrainState, batch, rng):
            k_gen, k_disc = jax.random.split(rng)
            (g_total, (g_losses, mel_fake, x_len, starts)), g_grads = \
                jax.value_and_grad(gen_loss_fn, has_aux=True)(
                    state.gen_params, state.disc_params, batch, k_gen)
            g_updates, gen_opt = gen_tx.update(
                g_grads, state.gen_opt, state.gen_params)
            gen_params = optax.apply_updates(state.gen_params, g_updates)

            t = mel_fake.shape[1]
            (d_total, d_losses), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(
                state.disc_params, batch["mels"][:, :t],
                jax.lax.stop_gradient(mel_fake), x_len, starts)
            d_updates, disc_opt = disc_tx.update(
                d_grads, state.disc_opt, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_updates)

            metrics = {**g_losses, **d_losses,
                       "total_loss": g_total + d_total}
            return GanTrainState(step=state.step + 1, gen_params=gen_params,
                                 gen_opt=gen_opt, disc_params=disc_params,
                                 disc_opt=disc_opt), metrics

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())

            def sharded(state, batch, rng):
                batch = jax.lax.with_sharding_constraint(
                    batch, NamedSharding(mesh, P("data")))
                return step_fn(state, batch, rng)

            return jax.jit(sharded, donate_argnums=(0,),
                           out_shardings=(rep, rep))
        return jax.jit(step_fn, donate_argnums=(0,))

    def make_gan_eval_step(self, model, disc, mesh=None):
        base_loss = super().make_loss_fn(model, train=False)

        def eval_fn(state_params, batch, rng):
            if mesh is not None:  # multi-host: run over the global mesh
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch = jax.lax.with_sharding_constraint(
                    batch, NamedSharding(mesh, P("data")))
            total, metrics = base_loss(state_params["gen"], batch, rng)
            metrics = dict(metrics)
            metrics["total_loss"] = total
            return metrics

        return jax.jit(eval_fn)

    def build_infer_fn(self, model):
        base = super().build_infer_fn(model)

        def infer_fn(variables, batch, rng):
            return base({"params": variables["params"]["gen"]}, batch, rng)

        return infer_fn
