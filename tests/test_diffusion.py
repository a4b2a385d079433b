import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.ops import diffusion as D


def test_schedule_identities():
    sched = D.DiffusionSchedule.create("vpsde", timesteps=8)
    assert sched.betas.shape == (9,)
    ac = np.cumprod(1 - np.asarray(sched.betas))
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2
        + np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2,
        1.0, rtol=1e-5)


def test_all_schedule_modes():
    for mode in ["linear", "cosine", "vpsde", "logsnr"]:
        s = D.get_noise_schedule_list(mode, 9, 0.1, 40)
        assert len(s) == 9


def test_diffuse_neg_t_returns_gt():
    sched = D.DiffusionSchedule.create("vpsde", timesteps=4)
    x0 = jnp.ones((2, 6, 3))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.array([-1, 2])
    out = D.diffuse(sched, x0, t, noise)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x0[0]))
    assert not np.allclose(np.asarray(out[1]), np.asarray(x0[1]))


def test_p_sample_loop_converges_to_x0_with_oracle():
    """If the denoiser is an oracle returning the true x0, the reverse scan
    must land on x0 (posterior mean at t=0 is exactly x0_pred)."""
    sched = D.DiffusionSchedule.create("vpsde", timesteps=8)
    x0 = jnp.broadcast_to(jnp.linspace(-1, 1, 5), (2, 4, 5)).astype(jnp.float32)

    def oracle(x_t, t, cond):
        return x0

    out = D.p_sample_loop(sched, oracle, cond=jnp.zeros((2, 4, 1)),
                          shape=x0.shape, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_q_posterior_t0_deterministic():
    sched = D.DiffusionSchedule.create("vpsde", timesteps=8)
    x0 = jnp.zeros((1, 3, 2))
    xt = jnp.ones((1, 3, 2))
    t0 = jnp.array([0])
    a = D.q_posterior_sample(sched, x0, xt, t0, jax.random.PRNGKey(0))
    b = D.q_posterior_sample(sched, x0, xt, t0, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
