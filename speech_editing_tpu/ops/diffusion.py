"""DDPM math for masked-conditional mel diffusion, as pure JAX functions.

Capability parity with the reference's GaussianDiffusion internals
(``modules/speech_editing/spec_denoiser/spec_denoiser.py:26-151`` and the
schedule builders in ``diffusion_utils.py:16-46``), re-designed TPU-first:

* schedule buffers live in an immutable pytree (:class:`DiffusionSchedule`)
  instead of registered module buffers;
* the T-step reverse loop is a single ``lax.scan`` (one compiled program,
  no per-step Python dispatch) — ``p_sample_loop``;
* the model predicts **x0 directly** (not epsilon), matching FluentSpeech.

Conventions: mel tensors are feature-last ``[B, T, M]`` (TPU lane dim = M),
``t`` is an int32 ``[B]`` vector indexing buffers of length ``timesteps+1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


# ---------------------------------------------------------------------------
# Beta schedules (host-side numpy; formulas per reference diffusion_utils.py)
# ---------------------------------------------------------------------------

def _vpsde_beta_t(t: int, big_t: int, min_beta: float, max_beta: float) -> float:
    t_coef = (2 * t - 1) / (big_t ** 2)
    return 1.0 - float(np.exp(-min_beta / big_t - 0.5 * (max_beta - min_beta) * t_coef))


def _logsnr_cosine(t: float, logsnr_min: float, logsnr_max: float) -> float:
    b = np.arctan(np.exp(-0.5 * logsnr_max))
    a = np.arctan(np.exp(-0.5 * logsnr_min)) - b
    return float(-2.0 * np.log(np.tan(a * t + b)))


def get_noise_schedule_list(schedule_mode: str, timesteps: int,
                            min_beta: float = 0.0, max_beta: float = 0.01,
                            s: float = 0.008) -> np.ndarray:
    if schedule_mode == "linear":
        return np.linspace(1e-6, 0.01, timesteps)
    if schedule_mode == "cosine":
        steps = timesteps + 1
        x = np.linspace(0, steps, steps)
        ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1 - (ac[1:] / ac[:-1])
        return np.clip(betas, 0, 0.999)
    if schedule_mode == "vpsde":
        return np.array([_vpsde_beta_t(t, timesteps, min_beta, max_beta)
                         for t in range(1, timesteps + 1)])
    if schedule_mode == "logsnr":
        return np.array([_logsnr_cosine(t / timesteps, -20.0, 20.0)
                         for t in range(1, timesteps + 1)])
    raise NotImplementedError(schedule_mode)


# ---------------------------------------------------------------------------
# Schedule pytree
# ---------------------------------------------------------------------------

@struct.dataclass
class DiffusionSchedule:
    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    posterior_log_variance_clipped: jax.Array
    num_timesteps: int = struct.field(pytree_node=False)
    time_scale: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, schedule_type: str = "vpsde", timesteps: int = 8,
               time_scale: int = 1, min_beta: float = 0.1,
               max_beta: float = 40.0, s: float = 0.008,
               betas: np.ndarray | None = None) -> "DiffusionSchedule":
        """Build buffers of length timesteps+1 (reference spec_denoiser.py:26-72:
        the FluentSpeech ctor hardcodes min_beta=0.1, max_beta=40)."""
        if betas is None:
            betas = get_noise_schedule_list(schedule_type, timesteps + 1,
                                            min_beta, max_beta, s)
        betas = np.asarray(betas, np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        # buffers stay HOST numpy: closing over device arrays in a jitted
        # sampler permanently degrades dispatch on the axon backend (they
        # become trace-time constants either way; see CLAUDE.md)
        f32 = lambda x: np.asarray(x, np.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(ac),
            sqrt_alphas_cumprod=f32(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
            posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
            posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
            num_timesteps=int(timesteps),
            time_scale=int(time_scale),
        )


def _bcast(buf, t: jax.Array, ndim: int, dtype=None) -> jax.Array:
    """buf[t] reshaped to broadcast over an ndim tensor with leading batch.

    ``dtype``: cast the (f32 host-buffer) coefficient to the activation
    dtype — otherwise an f32 scalar silently promotes the whole bf16
    compute path back to f32 (doubling HBM traffic).
    """
    out = jnp.asarray(buf)[t].reshape(t.shape[0], *([1] * (ndim - 1)))
    return out.astype(dtype) if dtype is not None else out


def q_sample(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward-diffuse x0 to x_t."""
    d = x_start.dtype
    return (_bcast(sched.sqrt_alphas_cumprod, t, x_start.ndim, d) * x_start
            + _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim, d)
            * noise.astype(d))


def diffuse(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array,
            noise: jax.Array) -> jax.Array:
    """q_sample with the reference's ``t == -1 -> ground truth`` trick
    (spec_denoiser.py:144-151)."""
    neg = (t < 0)
    t_safe = jnp.where(neg, 0, t)
    out = q_sample(sched, x_start, t_safe, noise)
    return jnp.where(neg.reshape(-1, *([1] * (x_start.ndim - 1))), x_start, out)


def is_per_row_keys(rng) -> bool:
    """True when ``rng`` is a stacked per-row key array (one key per batch
    row, request-level determinism for batched serving) rather than a
    single PRNG key. Handles both typed keys ([B] of key dtype) and legacy
    uint32 keys ([B, 2])."""
    if rng is None or not hasattr(rng, "ndim"):
        return False
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng.ndim >= 1
    return rng.ndim >= 2


def per_row_noise(row_keys: jax.Array, step: int, shape: tuple,
                  dtype=jnp.float32) -> jax.Array:
    """Noise [B, *shape] where row j's block depends ONLY on (row_keys[j],
    step) — not on j, the batch size, or the other rows. Because threefry
    bit-streams are counter-indexed over the flattened shape, a draw at a
    padded frame length is a prefix-extension of the exact-fit draw, so a
    request's real-frame noise is also invariant to frame-bucket padding."""
    return jax.vmap(lambda k: jax.random.normal(
        jax.random.fold_in(k, step), shape, dtype))(row_keys)


def q_posterior_sample(sched: DiffusionSchedule, x0_pred: jax.Array,
                       x_t: jax.Array, t: jax.Array, key=None,
                       noise=None) -> jax.Array:
    """Sample x_{t-1} ~ q(x_{t-1} | x_t, x0_pred); deterministic at t=0.

    Pass either ``key`` (noise drawn here, one stream for the whole batch)
    or a precomputed ``noise`` tensor — serving uses the latter with
    per-request noise so a row's sample is independent of its batch row.
    """
    d = x_t.dtype
    mean = (_bcast(sched.posterior_mean_coef1, t, x_t.ndim, d) * x0_pred.astype(d)
            + _bcast(sched.posterior_mean_coef2, t, x_t.ndim, d) * x_t)
    log_var = _bcast(sched.posterior_log_variance_clipped, t, x_t.ndim, d)
    if noise is None:
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    else:
        noise = noise.astype(x_t.dtype)
    nonzero = (t > 0).astype(x_t.dtype).reshape(-1, *([1] * (x_t.ndim - 1)))
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


def p_sample_loop(sched: DiffusionSchedule, denoise_fn, cond: jax.Array,
                  shape: tuple, key: jax.Array) -> jax.Array:
    """Full reverse process T-1..0 as one ``lax.scan``.

    ``denoise_fn(x_t, t, cond) -> x0_pred`` where x_t: [B, T_mel, M].
    Replaces the reference's Python loop of ``p_sample`` calls
    (spec_denoiser.py:178-184).
    """
    big_t = sched.num_timesteps
    key, sub = jax.random.split(key)
    x_init = jax.random.normal(sub, shape, jnp.float32)
    b = shape[0]

    def step(x, inp):
        t_scalar, k = inp
        t = jnp.full((b,), t_scalar, jnp.int32)
        x0_pred = denoise_fn(x, t, cond)
        x_next = q_posterior_sample(sched, x0_pred, x, t, k)
        return x_next, None

    ts = jnp.arange(big_t - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, big_t)
    x_final, _ = jax.lax.scan(step, x_init, (ts, keys))
    return x_final
