"""DiffSpeech: epsilon-prediction diffusion TTS (flax.linen).

Parity surface: the ProDiff-style ``GaussianDiffusion`` in
``modules/speech_editing/spec_denoiser/diffusion_utils.py:98-269`` as used by
``tasks/tts/diffspeech.py``: FastSpeech conditioner (full, no masking),
mel normalized to [-1, 1] via spec_min/spec_max, the denoiser predicts the
NOISE (epsilon) rather than x0, and the reverse step clips the implied x0.

TPU-first: same DiffNet denoiser and schedule pytree as the editing model;
the reverse loop unrolls over T (config 'timesteps'; keep it small or use
the external lax.scan sampler for large T).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.models.fs import FastSpeech
from speech_editing_tpu.modules.wavenet import DiffNet
from speech_editing_tpu.ops import diffusion as diff_ops


class DiffSpeech(nn.Module):
    vocab_size: int
    hp: Any
    out_dims: int = 80

    def setup(self):
        hp = self.hp
        self.fs = FastSpeech(self.vocab_size, hp)
        self.denoise_fn = DiffNet(
            in_dims=self.out_dims, encoder_hidden=hp["hidden_size"],
            residual_layers=hp["residual_layers"],
            residual_channels=hp["residual_channels"],
            dilation_cycle_length=hp["dilation_cycle_length"],
            remat=bool(hp.get("remat_diffnet", False)),
            allow_fused=bool(hp.get("fused_diffnet", False)))
        self.sched = diff_ops.DiffusionSchedule.create(
            schedule_type=hp.get("schedule_type", "cosine"),
            timesteps=hp["timesteps"], time_scale=hp.get("timescale", 1),
            max_beta=hp.get("max_beta", 0.06))
        spec_min = np.asarray(hp.get("spec_min") or [-6.0] * self.out_dims)
        spec_max = np.asarray(hp.get("spec_max") or [1.5] * self.out_dims)
        self.spec_min = jnp.asarray(spec_min[: self.out_dims], jnp.float32)
        self.spec_max = jnp.asarray(spec_max[: self.out_dims], jnp.float32)

    def norm_spec(self, x):
        return (x - self.spec_min) / (self.spec_max - self.spec_min) * 2 - 1

    def denorm_spec(self, x):
        return (x + 1) / 2 * (self.spec_max - self.spec_min) + self.spec_min

    def _eps_to_x0(self, x_t, eps, t):
        s = self.sched
        sqrt_ac = jnp.asarray(s.sqrt_alphas_cumprod)[t].reshape(-1, 1, 1)
        sqrt_om = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t].reshape(-1, 1, 1)
        return (x_t - sqrt_om * eps) / jnp.maximum(sqrt_ac, 1e-8)

    def denoise(self, x_t, t, cond):
        """Predicted epsilon (exposed for the external lax.scan sampler)."""
        return self.denoise_fn(x_t, t, cond)

    def compute_cond(self, txt_tokens, mel2ph=None, spk_embed=None,
                     f0=None, uv=None):
        """Conditioner pass only, for external reverse-scan inference."""
        ret = self.fs(txt_tokens, None, mel2ph, spk_embed, f0, uv,
                      skip_decoder=True, infer=True,
                      use_pred_mel2ph=mel2ph is None,
                      use_pred_pitch=f0 is None)
        return ret

    def __call__(self, txt_tokens, mel2ph=None, spk_embed=None, ref_mels=None,
                 f0=None, uv=None, energy=None, infer: bool = False,
                 rng: Optional[jax.Array] = None, train: bool = False, **kw):
        if rng is None:
            rng = self.make_rng("diffusion")
        ret = self.fs(txt_tokens, None, mel2ph, spk_embed, f0, uv, energy,
                      skip_decoder=True, infer=infer,
                      use_pred_mel2ph=infer and mel2ph is None,
                      use_pred_pitch=infer and f0 is None, train=train)
        cond = ret["decoder_inp"]
        mel2ph_eff = ret["mel2ph"]
        tgt_nonpadding = (mel2ph_eff > 0)[:, :, None].astype(cond.dtype)
        b = txt_tokens.shape[0]
        if not infer:
            x_start = self.norm_spec(ref_mels)
            k_t, k_noise = jax.random.split(rng)
            t = jax.random.randint(k_t, (b,), 0, self.sched.num_timesteps)
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
            x_t = diff_ops.q_sample(self.sched, x_start, t, noise)
            eps_pred = self.denoise_fn(x_t * tgt_nonpadding, t, cond)
            ret["noise_pred"] = eps_pred * tgt_nonpadding
            ret["noise_gt"] = noise * tgt_nonpadding
            # expose the implied x0 for validation plots
            x0 = jnp.clip(self._eps_to_x0(x_t, eps_pred, t), -1, 1)
            ret["mel_out"] = self.denorm_spec(x0) * tgt_nonpadding
        else:
            big_t = self.sched.num_timesteps
            key, sub = jax.random.split(rng)
            # mask x at every step — padded frames must stay zero or their
            # noise leaks into real frames via DiffNet convs (spec_denoiser)
            tn32 = tgt_nonpadding.astype(jnp.float32)
            x = jax.random.normal(sub, (b, cond.shape[1], self.out_dims),
                                  jnp.float32) * tn32
            for i in range(big_t - 1, -1, -1):
                t = jnp.full((b,), i, jnp.int32)
                key, sub = jax.random.split(key)
                eps = self.denoise_fn(x, t, cond)
                x0 = jnp.clip(self._eps_to_x0(x, eps, t), -1, 1)
                x = diff_ops.q_posterior_sample(
                    self.sched, x0, x, t, sub) * tn32
            ret["mel_out"] = self.denorm_spec(x) * tgt_nonpadding
        return ret
