"""Worker for the 2-process jax.distributed test (not a pytest module).

Each process owns 2 virtual CPU devices; init_distributed joins them into a
4-device global mesh (the multi-host path of ``parallel/mesh.py`` —
reference equivalent: NCCL process-group bring-up, trainer.py:474-495).
Runs 3 DP train steps of a real FastSpeech model on a cross-process-sharded
global batch and prints LOSS/PSUM for the parent to compare.
"""

import os
import sys

if __name__ == "__main__":
    # env must be set before the first jax import (worker mode only; the
    # parent test imports this module just for build())
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from speech_editing_tpu.parallel.mesh import (batch_sharding,  # noqa: E402
                                              init_distributed, make_mesh,
                                              replicated)
from speech_editing_tpu.training.train_state import (TrainState,  # noqa: E402
                                                     make_train_step)
from tests.helpers import TINY_HP, VOCAB, synth_batch  # noqa: E402


def build(global_batch, mesh=None):
    from speech_editing_tpu.models.fs import FastSpeech

    model = FastSpeech(vocab_size=VOCAB, hp=TINY_HP)

    def loss_fn(params, batch, rng):
        ret = model.apply({"params": params}, batch["txt_tokens"],
                          mel2ph=batch["mel2ph"], f0=batch["f0"],
                          uv=batch["uv"], rngs={"dropout": rng})
        nonpad = (batch["mel2ph"] > 0)[:, :, None]
        l1 = jnp.abs(ret["mel_out"] - batch["mels"]) * nonpad
        return l1.sum() / jnp.maximum(nonpad.sum() * 80, 1), {}

    init_b = {k: jnp.asarray(v[:1]) for k, v in global_batch.items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), init_b["txt_tokens"],
        mel2ph=init_b["mel2ph"], f0=init_b["f0"], uv=init_b["uv"])["params"]
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(loss_fn, tx, mesh=mesh)
    return state, step


def main(pid: int, nproc: int, port: str):
    init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc
    mesh = make_mesh()

    rng = np.random.RandomState(0)
    gb = {k: v for k, v in synth_batch(rng, B=8).items()
          if k in ("txt_tokens", "mel2ph", "f0", "uv", "mels")}
    state, step = build(gb, mesh)
    state = jax.device_put(state, replicated(mesh))

    per = 8 // nproc
    bsh = batch_sharding(mesh)
    batch = {k: jax.make_array_from_process_local_data(
        bsh, np.ascontiguousarray(v[pid * per:(pid + 1) * per]),
        v.shape) for k, v in gb.items()}

    loss = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        loss = metrics["total_loss"]
    psum = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), state.params, 0.0)
    print(f"RESULT {float(loss):.8f} {psum:.6f}", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
