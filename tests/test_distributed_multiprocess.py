"""Multi-process distributed training test (VERDICT r1 item #5).

Spawns 2 OS processes, each with 2 virtual CPU devices, joined by
``parallel.mesh.init_distributed`` (jax.distributed + Gloo CPU collectives)
into one 4-device data mesh — the multi-host path the reference covers with
mp.spawn + NCCL (``trainer.py:474-495``). Asserts:

* both processes see the global device set and produce IDENTICAL loss and
  updated params after 3 DP train steps (gradient sync happened),
* the distributed loss equals a single-process run on the same global
  batch (cross-process batch sharding = the reference's rank-strided
  slicing, ``speech_base.py:128-131``).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")
TRAINER_WORKER = os.path.join(REPO, "tests", "distributed_trainer_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for p in procs:
        # generous: on the 1-CPU host a concurrent compile-heavy job can
        # triple the workers' wall time (observed flake at 240s)
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out
        _, loss, psum = lines[0].split()
        results.append((float(loss), float(psum)))
    # gradient sync: both processes computed the identical global update
    assert results[0] == results[1], results

    # the distributed loss matches a single-process run on the full batch
    from tests.helpers import synth_batch

    import jax

    sys.path.insert(0, REPO)
    from tests.distributed_worker import build

    rng = np.random.RandomState(0)
    gb = {k: v for k, v in synth_batch(rng, B=8).items()
          if k in ("txt_tokens", "mel2ph", "f0", "uv", "mels")}
    state, step = build(gb, mesh=None)
    batch = {k: jax.numpy.asarray(v) for k, v in gb.items()}
    loss = None
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        loss = float(metrics["total_loss"])
    assert abs(loss - results[0][0]) < 1e-4, (loss, results[0][0])


def test_two_process_product_trainer_fit(tmp_path):
    """VERDICT r2 #1: TWO processes run the real ``Trainer.fit`` for 10
    steps (loader + sanity val + validation + checkpointing) and produce a
    checkpoint matching a single-process run on the same 4-device global
    mesh and batch stream. Also asserts process-0 output gating: only
    process 0 writes checkpoints/logs."""
    from tests.helpers import write_synth_corpus

    data_dir = str(tmp_path / "binary")
    work_multi = str(tmp_path / "work_multi")
    work_single = str(tmp_path / "work_single")
    write_synth_corpus(data_dir, np.random.RandomState(0), n_items=12)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"

    # 2 processes x 2 virtual devices = the same 4-device data mesh
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, TRAINER_WORKER, str(i), "2", str(port),
         data_dir, work_multi, "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "DONE pid=0 step=10" in outs[0], outs[0]
    assert "DONE pid=1 step=10" in outs[1], outs[1]
    # process-0 gating: only pid 0 prints the training logs
    assert "| step " in outs[0]
    assert "| step " not in outs[1], outs[1]

    # single-process reference on the identical 4-device mesh
    p = subprocess.Popen(
        [sys.executable, TRAINER_WORKER, "0", "1", "0",
         data_dir, work_single, "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"single-process run failed:\n{out}"

    from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                        load_checkpoint)

    path_m, steps_m = get_last_checkpoint(work_multi)
    path_s, steps_s = get_last_checkpoint(work_single)
    assert steps_m == steps_s == 10, (steps_m, steps_s)
    import jax

    pm = load_checkpoint(path_m)["state"].params
    ps = load_checkpoint(path_s)["state"].params
    leaves_m, treedef_m = jax.tree.flatten(pm)
    leaves_s, treedef_s = jax.tree.flatten(ps)
    assert treedef_m == treedef_s
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_two_process_gan_trainer_fit(tmp_path):
    """VERDICT r3 #4: the GAN (multi-optimizer) trainer path under 2
    processes — the reference covers this surface with its DDP
    multi-optimizer loop (``utils/commons/trainer.py:312``). Asserts a
    2-process ``Trainer.fit`` on HifiGanTask produces generator AND
    discriminator checkpoints matching a single-process run on the same
    4-device global mesh."""
    from tests.helpers import write_voc_corpus

    data_dir = str(tmp_path / "voc")
    work_multi = str(tmp_path / "work_multi")
    work_single = str(tmp_path / "work_single")
    write_voc_corpus(data_dir, np.random.RandomState(0), n_items=12)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, TRAINER_WORKER, str(i), "2", str(port),
         data_dir, work_multi, "2", "gan"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "DONE pid=0 step=6" in outs[0], outs[0]
    assert "DONE pid=1 step=6" in outs[1], outs[1]

    p = subprocess.Popen(
        [sys.executable, TRAINER_WORKER, "0", "1", "0",
         data_dir, work_single, "4", "gan"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"single-process run failed:\n{out}"

    from speech_editing_tpu.training.checkpoint import (get_last_checkpoint,
                                                        load_checkpoint)

    path_m, steps_m = get_last_checkpoint(work_multi)
    path_s, steps_s = get_last_checkpoint(work_single)
    assert steps_m == steps_s == 6, (steps_m, steps_s)
    import jax

    sm = load_checkpoint(path_m)["state"]
    ss = load_checkpoint(path_s)["state"]
    # compare the FULL GAN state (generator + discriminator params)
    leaves_m, treedef_m = jax.tree.flatten(
        {"gen": sm.gen_params, "disc": sm.disc_params})
    leaves_s, treedef_s = jax.tree.flatten(
        {"gen": ss.gen_params, "disc": ss.disc_params})
    assert treedef_m == treedef_s
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_multihost_infer_guard(monkeypatch, tmp_path):
    """``Trainer.test`` must fail loudly (not deadlock) under multi-host:
    non-main processes return early while main would enter global-mesh
    state replication — a collective the others never join."""
    from tests.helpers import TINY_HP
    from speech_editing_tpu.training.tasks.spec_denoiser import \
        SpecDenoiserTask
    from speech_editing_tpu.training.trainer import Trainer

    hp = dict(TINY_HP, binary_data_dir=str(tmp_path), infer=True,
              work_dir=str(tmp_path / "work"), vocab_size=10)
    trainer = Trainer(SpecDenoiserTask(hp), hp)
    trainer.n_proc = 2  # simulate a 2-process launch
    with pytest.raises(RuntimeError, match="single-process"):
        trainer.test()
