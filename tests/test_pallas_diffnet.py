"""Fused Pallas DiffNet block: forward + gradient parity vs the XLA path.

On CPU the kernels run in interpret mode; numerics are identical by
construction, so these tests guard the kernel math (shift handling, gate
backward, padding masks) while the TPU speed claim is checked on hardware
by scripts/bench_train.py A/B (SET_FUSED_DIFFNET=0|1).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.ops.pallas.diffnet_block import fused_diffnet_block


def _ref_block(x, cond, step, wd, bd, wc, bc, wo, bo):
    """Plain-XLA reference of the gated residual block."""
    c = x.shape[-1]
    y = x + step[:, None, :]
    zero = jnp.zeros_like(y[:, :1])
    cat = jnp.concatenate([
        jnp.concatenate([zero, y[:, :-1]], axis=1), y,
        jnp.concatenate([y[:, 1:], zero], axis=1)], axis=2)
    h = cat @ wd + bd + cond @ wc + bc
    g = jax.nn.sigmoid(h[..., :c]) * jnp.tanh(h[..., c:])
    o = g @ wo + bo
    return ((x + o[..., :c]) / math.sqrt(2.0), o[..., c:])


def _inputs(rs, b=2, t=37, c=32, hdim=24):
    return (
        jnp.asarray(rs.randn(b, t, c), jnp.float32),
        jnp.asarray(rs.randn(b, t, hdim) * 0.5, jnp.float32),
        jnp.asarray(rs.randn(b, c) * 0.3, jnp.float32),
        jnp.asarray(rs.randn(3 * c, 2 * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(2 * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(hdim, 2 * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(2 * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(c, 2 * c) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(2 * c) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("t", [37, 555])
def test_fused_block_forward_matches_xla(rng, t):
    # t=555 exercises the multi-tile path (2 tiles + halo rows + tail pad)
    args = _inputs(rng, t=t)
    xo_f, sk_f = jax.jit(fused_diffnet_block)(*args)
    xo_r, sk_r = _ref_block(*args)
    np.testing.assert_allclose(np.asarray(xo_f), np.asarray(xo_r),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sk_f), np.asarray(sk_r),
                               atol=2e-5, rtol=1e-5)


def test_tiling_covers_t():
    from speech_editing_tpu.ops.pallas.diffnet_block import _tiles
    for t in (1, 7, 37, 512, 513, 1024, 1548, 4096):
        for dt in (jnp.float32, jnp.bfloat16):
            nt, tt, t_pad = _tiles(t, dt)
            mult = 16 if dt == jnp.bfloat16 else 8
            assert t_pad >= t and nt * tt == t_pad and tt % mult == 0
            assert t_pad - t < tt  # no empty tiles


@pytest.mark.parametrize("t", [37, 555])
def test_fused_block_grads_match_xla(rng, t):
    args = _inputs(rng, t=t)

    def loss_fused(*a):
        xo, sk = fused_diffnet_block(*a)
        return jnp.sum(xo ** 2) + jnp.sum(jnp.abs(sk))

    def loss_ref(*a):
        xo, sk = _ref_block(*a)
        return jnp.sum(xo ** 2) + jnp.sum(jnp.abs(sk))

    argnums = tuple(range(9))
    g_f = jax.jit(jax.grad(loss_fused, argnums=argnums))(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=argnums))(*args)
    names = ("x", "cond", "step", "wd", "bd", "wc", "bc", "wo", "bo")
    for name, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_diffnet_fused_path_matches_unfused(rng, monkeypatch):
    """Whole DiffNet: the Pallas path produces the same outputs and accepts
    the same checkpoint tree as the nn.Conv path."""
    from speech_editing_tpu.modules.wavenet import DiffNet

    b, t, m, hdim = 2, 45, 16, 24
    spec = jnp.asarray(rng.randn(b, t, m), jnp.float32)
    cond = jnp.asarray(rng.randn(b, t, hdim), jnp.float32)
    tstep = jnp.asarray([1, 3], jnp.int32)

    def build(flag):
        monkeypatch.setenv("SET_FUSED_DIFFNET", flag)
        model = DiffNet(in_dims=m, encoder_hidden=hdim, residual_layers=3,
                        residual_channels=32, allow_fused=flag == "1")
        params = jax.jit(model.init)(jax.random.PRNGKey(0), spec, tstep,
                                     cond)
        out = model.apply(params, spec, tstep, cond)
        return params, np.asarray(out)

    params_off, out_off = build("0")
    params_on, out_on = build("1")
    # identical param trees (checkpoints interchange between paths)
    flat_a = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(params_off)}
    flat_b = {jax.tree_util.keystr(p): v.shape for p, v in
              jax.tree_util.tree_leaves_with_path(params_on)}
    assert flat_a == flat_b
    for a, b2 in zip(jax.tree.leaves(params_off), jax.tree.leaves(params_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    np.testing.assert_allclose(out_on, out_off, atol=5e-5, rtol=1e-5)
