"""Tensor-parallel sharding: dp x tp mesh training step on the virtual
8-device CPU mesh (conftest forces XLA_FLAGS device count)."""

import numpy as np
import pytest

from tests.helpers import TINY_HP, VOCAB, synth_batch


@pytest.fixture(scope="module")
def jax():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax


def test_param_partition_specs_heuristic(jax):
    import jax.numpy as jnp

    from speech_editing_tpu.parallel.tp import param_partition_specs

    params = {
        "dense": {"kernel": jnp.zeros((64, 64)), "bias": jnp.zeros((64,))},
        "conv": {"kernel": jnp.zeros((3, 32, 64))},
        "tiny": {"kernel": jnp.zeros((4, 4))},
        "odd": {"kernel": jnp.zeros((63, 63))},
    }
    specs = param_partition_specs(params, tp=2, min_size=1024)
    assert specs["dense"]["kernel"] == (None, "model")
    assert specs["dense"]["bias"] == ()          # 1-D -> replicated
    assert specs["conv"]["kernel"] == (None, None, "model")
    assert specs["tiny"]["kernel"] == ()         # too small
    assert specs["odd"]["kernel"] == ()          # indivisible


def test_tp_train_step_matches_dp(jax):
    """One train step on dp=4 x tp=2 must match the pure-DP step numerics."""
    from speech_editing_tpu.parallel.mesh import make_mesh, shard_batch
    from speech_editing_tpu.parallel.tp import (make_tp_mesh,
                                                param_partition_specs)
    from speech_editing_tpu.training.tasks.spec_denoiser import \
        SpecDenoiserTask
    from speech_editing_tpu.training.train_state import (TrainState,
                                                         make_train_step)

    hp = dict(TINY_HP)
    hp["vocab_size"] = VOCAB
    hp["binary_data_dir"] = ""
    task = SpecDenoiserTask(hp)
    model = task.build_model()
    batch_np = synth_batch(np.random.RandomState(0), B=8, S=8, T=64)

    variables = task.init_model(model, batch_np, jax.random.PRNGKey(0))
    from speech_editing_tpu.training.optim import build_optimizer

    tx = build_optimizer(hp)
    loss_fn = task.make_loss_fn(model)
    rng = jax.random.PRNGKey(7)

    # host copies: the train step donates its state, so each TrainState
    # needs its own buffers
    params_host = jax.tree.map(np.asarray, variables["params"])

    # pure DP over 8 devices
    mesh_dp = make_mesh(8)
    step_dp = make_train_step(loss_fn, tx, mesh=mesh_dp)
    s0 = TrainState.create(params_host, tx)
    s_dp, m_dp = step_dp(s0, shard_batch(batch_np, mesh_dp), rng)

    # dp=4 x tp=2 with sharded params (min_size tiny so SOMETHING shards)
    mesh_tp = make_tp_mesh(8, tp=2)
    specs = param_partition_specs(variables["params"], tp=2, min_size=256)
    n_sharded = sum(1 for s in jax.tree.leaves(specs)
                    if any(a is not None for a in s))
    assert n_sharded > 0, "heuristic sharded nothing at min_size=256"
    step_tp = make_train_step(loss_fn, tx, mesh=mesh_tp, param_specs=specs)
    s1 = TrainState.create(jax.tree.map(np.copy, params_host), tx)
    s_tp, m_tp = step_tp(s1, shard_batch(batch_np, mesh_tp), rng)

    assert np.isfinite(float(m_tp["total_loss"]))
    np.testing.assert_allclose(float(m_tp["total_loss"]),
                               float(m_dp["total_loss"]), rtol=2e-3)
    # updated params agree between the two layouts
    for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    # at least one live param is physically sharded over the model axis
    sharded_live = [p for p in jax.tree.leaves(s_tp.params)
                    if not p.sharding.is_fully_replicated]
    assert sharded_live, "no live param is model-sharded"
