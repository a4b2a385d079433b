"""Optimizer / LR-schedule builders (optax).

Capability parity with the reference:

* AdamW with (beta1, beta2, weight_decay) from config
  (``tasks/tts/speech_base.py:152-160``);
* LR schedules ``none`` / ``warmup`` / ``rsqrt``
  (``utils/nn/schedulers.py``): warmup = linear ramp to constant lr over
  ``warmup_updates``; rsqrt = lr * warmup * (step^-0.5 scaled) * hidden^-0.5;
* gradient clipping by global norm and/or value
  (``utils/commons/base_task.py:129-133``).

TPU-first: the whole update is one optax chain inside the jitted train step —
no host-side scheduler object mutating state between steps.
"""

from __future__ import annotations

import optax


def build_lr_schedule(hp) -> optax.Schedule:
    kind = hp.get("scheduler", "warmup")
    lr = float(hp["lr"])
    warmup = int(hp.get("warmup_updates", 8000))
    if kind in ("none", None, ""):
        return lambda step: lr
    if kind == "warmup":
        def sched(step):
            import jax.numpy as jnp
            return lr * jnp.minimum(step / max(warmup, 1), 1.0)
        return sched
    if kind == "rsqrt":
        hidden = float(hp.get("hidden_size", 256))
        factor = hidden ** -0.5

        def sched(step):
            import jax.numpy as jnp
            step = jnp.maximum(step, 1.0)
            w = jnp.minimum(step * warmup ** -1.5, step ** -0.5) * warmup ** 0.5
            return lr * factor * w
        return sched
    raise NotImplementedError(f"scheduler={kind}")


def build_optimizer(hp, lr_schedule: optax.Schedule | None = None
                    ) -> optax.GradientTransformation:
    if lr_schedule is None:
        lr_schedule = build_lr_schedule(hp)
    chain = []
    if hp.get("clip_grad_value", 0):
        chain.append(optax.clip(float(hp["clip_grad_value"])))
    if hp.get("clip_grad_norm", 0):
        chain.append(optax.clip_by_global_norm(float(hp["clip_grad_norm"])))
    chain.append(optax.adamw(
        learning_rate=lr_schedule,
        b1=float(hp.get("optimizer_adam_beta1", 0.9)),
        b2=float(hp.get("optimizer_adam_beta2", 0.98)),
        weight_decay=float(hp.get("weight_decay", 0) or 0.0)))
    return optax.chain(*chain)


def build_gan_optimizer(hp) -> optax.GradientTransformation:
    """Vocoder GAN AdamW pair config (``tasks/vocoder/vocoder_base.py:61-76``):
    constant lr with StepLR decay every ``generator_scheduler_steps``."""
    lr = float(hp["lr"])
    gamma = float(hp.get("lr_decay", 0.999))
    decay_steps = int(hp.get("scheduler_step_size", 600))

    def sched(step):
        import jax.numpy as jnp
        return lr * gamma ** jnp.floor(step / decay_steps)

    return optax.adamw(learning_rate=sched,
                       b1=float(hp.get("adam_b1", 0.8)),
                       b2=float(hp.get("adam_b2", 0.99)))
