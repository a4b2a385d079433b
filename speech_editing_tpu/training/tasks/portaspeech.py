"""PortaSpeech tasks: VAE TTS (+post-flow variant).

Parity surface: ``tasks/tts/ps.py`` (mel l1+ssim, KL with linear warmup to
``kl_start_steps``, floor ``kl_min``, scaled by ``lambda_kl``; word-level
duration loss) and ``tasks/tts/ps_flow.py`` (adds the post-flow NLL).

The KL warmup is a function of the step counter, threaded through the batch
as a scalar so the jitted loss stays pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speech_editing_tpu.data.datasets import WordSpeechDataset
from speech_editing_tpu.models.portaspeech import PortaSpeech, PortaSpeechFlow
from speech_editing_tpu.training.losses import add_mel_loss
from speech_editing_tpu.training.tasks.base import BaseTask


class PortaSpeechTask(BaseTask):
    dataset_cls = WordSpeechDataset
    array_batch_keys = ("txt_tokens", "word_tokens", "ph2word", "mel2word",
                        "mels", "pitch")
    model_cls = PortaSpeech

    def __init__(self, hp):
        super().__init__(hp)
        import json
        import os

        word_fn = os.path.join(hp.get("binary_data_dir", ""), "word_set.json")
        if os.path.exists(word_fn):
            from speech_editing_tpu.utils.text.text_encoder import \
                build_token_encoder

            self.word_encoder = build_token_encoder(word_fn)
            self.word_dict_size = self.word_encoder.vocab_size
        else:
            self.word_encoder = None
            self.word_dict_size = int(hp.get("word_dict_size", 10000))

    def build_model(self):
        return self.model_cls(
            vocab_size=self.vocab_size, word_dict_size=self.word_dict_size,
            hp=self.hp, out_dims=self.hp.get("audio_num_mel_bins", 80))

    def _apply_train(self, model, params, batch, rng, k_drop,
                     train: bool = True):
        return model.apply(
            {"params": params}, batch["txt_tokens"], batch["word_tokens"],
            batch["ph2word"], mel2word=batch["mel2word"],
            spk_embed=batch.get("spk_embed"), pitch=batch.get("pitch"),
            tgt_mels=batch["mels"], infer=False, rng=rng, train=train,
            global_step=batch.get("global_step"),
            rngs={"dropout": k_drop})

    def make_loss_fn(self, model, train: bool = True):
        hp = self.hp
        mel_spec = hp.get("mel_losses", "l1:0.5|ssim:0.5")
        lambda_kl = float(hp.get("lambda_kl", 1.0))
        kl_min = float(hp.get("kl_min", 0.0))
        kl_start = float(hp.get("kl_start_steps", 10000))
        use_post_flow = self.model_cls is PortaSpeechFlow

        def loss_fn(params, batch, rng):
            k_vae, k_drop = jax.random.split(rng)
            out = self._apply_train(model, params, batch, rng=k_vae,
                                    k_drop=k_drop, train=train)
            losses: dict = {}
            t = out["mel_out"].shape[1]
            add_mel_loss(losses, out["mel_out"], batch["mels"][:, :t], mel_spec)
            step = batch.get("global_step", jnp.asarray(kl_start))
            kl = jnp.maximum(out["kl"], kl_min)
            losses["kl"] = (kl * jnp.minimum(step / kl_start, 1.0)
                            * lambda_kl)
            # word-level duration loss (log-domain mse over nonpadding words)
            word_nonpadding = (batch["word_tokens"] != 0).astype(jnp.float32)
            from speech_editing_tpu.ops.seq_ops import mel2token_to_dur

            dur_gt = mel2token_to_dur(
                batch["mel2word"], batch["word_tokens"].shape[1]
            ).astype(jnp.float32) * word_nonpadding
            wdur = (jnp.log1p(out["dur"]) - jnp.log1p(dur_gt)) ** 2
            losses["wdur"] = (jnp.sum(wdur * word_nonpadding)
                              / jnp.maximum(word_nonpadding.sum(), 1.0)
                              ) * hp.get("lambda_word_dur", 1.0)
            if use_post_flow:
                losses["postflow"] = out["postflow_nll"]
            return sum(losses.values()), losses

        return loss_fn

    def init_model(self, model, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)

        # bake static flags into the jitted init (infer must not be traced)
        def _init(rngs, txt, words, ph2word, mel2word, spk, pitch, mels):
            return model.init(rngs, txt, words, ph2word, mel2word=mel2word,
                              spk_embed=spk, pitch=pitch, tgt_mels=mels,
                              infer=False)

        return jax.jit(_init)(
            {"params": k1, "fvae": k2, "dropout": k3},
            jnp.asarray(batch["txt_tokens"]),
            jnp.asarray(batch["word_tokens"]),
            jnp.asarray(batch["ph2word"]),
            jnp.asarray(batch["mel2word"]),
            (jnp.asarray(batch["spk_embed"])
             if "spk_embed" in batch else None),
            (jnp.asarray(batch["pitch"]) if "pitch" in batch else None),
            jnp.asarray(batch["mels"]))

    def build_infer_fn(self, model):
        hp = self.hp

        def infer_fn(variables, batch, rng):
            out = model.apply(
                variables, batch["txt_tokens"], batch["word_tokens"],
                batch["ph2word"], mel2word=batch.get("mel2word"),
                spk_embed=batch.get("spk_embed"), pitch=batch.get("pitch"),
                infer=True, rng=rng,
                noise_scale=hp.get("noise_scale", 0.8))
            return out

        return jax.jit(infer_fn)


class PortaSpeechFlowTask(PortaSpeechTask):
    model_cls = PortaSpeechFlow
