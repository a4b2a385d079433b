"""Trainer integration: fit on synthetic corpus, resume, checkpoints, test."""

import os
from functools import partial

import numpy as np
import pytest

from speech_editing_tpu.training.checkpoint import (get_all_ckpts,
                                                    get_last_checkpoint)
from speech_editing_tpu.training.tasks.spec_denoiser import SpecDenoiserTask
from speech_editing_tpu.training.trainer import Trainer
from tests.helpers import TINY_HP, VOCAB, write_synth_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trainer")
    data_dir = str(tmp / "binary")
    work_dir = str(tmp / "work")
    write_synth_corpus(data_dir, np.random.RandomState(0), n_items=12)
    hp = dict(TINY_HP)
    hp.update(
        binary_data_dir=data_dir, work_dir=work_dir, exp_name="tiny",
        vocab_size=VOCAB, infer=False, seed=1234, sort_by_len=True,
        mask_type="alignment_aware", training_mask_ratio=0.8,
        max_frames=200, max_input_tokens=50, test_ids=[], min_frames=0,
        frame_size_multiple=32, token_size_multiple=8,
        max_updates=6, val_check_interval=3, tb_log_interval=2,
        num_sanity_val_steps=1, num_ckpt_keep=2, eval_max_batches=2,
        max_sentences=4, max_valid_sentences=2, max_tokens=2000,
        vocoder="GriffinLim", test_num=2, save_gt=True,
        audio_sample_rate=22050, endless_ds=True)
    task = SpecDenoiserTask(hp)
    trainer = Trainer(task, hp)
    trainer.fit()
    return hp, work_dir


def test_fit_reaches_max_updates_and_checkpoints(trained):
    hp, work_dir = trained
    path, steps = get_last_checkpoint(work_dir)
    assert path is not None and steps == 6
    assert len(get_all_ckpts(work_dir)) <= hp["num_ckpt_keep"]


def test_resume_from_checkpoint(trained):
    hp, work_dir = trained
    hp2 = dict(hp)
    hp2["max_updates"] = 8
    task = SpecDenoiserTask(hp2)
    trainer = Trainer(task, hp2)
    trainer.fit()
    _, steps = get_last_checkpoint(work_dir)
    assert steps == 8  # resumed from 6 and ran 2 more


def test_test_loop_writes_wavs(trained):
    hp, work_dir = trained
    task = SpecDenoiserTask(hp)
    trainer = Trainer(task, hp)
    gen_dir = trainer.test()
    wavs = os.listdir(os.path.join(gen_dir, "wavs"))
    assert any(w.startswith("[P]") and w.endswith(".wav") for w in wavs)
    assert any(w.startswith("[G]") for w in wavs)
    assert any(w.startswith("[P_SEG]") for w in wavs)
    assert any(w.endswith("_mel.npy") for w in wavs)
    # async saver parity with the reference output set
    # (speech_base.py:286-380): spectrogram plots + meta.csv
    plots = os.listdir(os.path.join(gen_dir, "plot"))
    assert any(p.startswith("[P]") and p.endswith(".png") for p in plots)
    assert any(p.startswith("[G]") and p.endswith(".png") for p in plots)
    assert os.path.exists(os.path.join(gen_dir, "meta.csv"))


def test_result_saver_pool_async():
    """ResultSaverPool with >1 worker runs jobs in spawned processes and
    drain() returns their results in submission order."""
    from speech_editing_tpu.utils.multiprocess import ResultSaverPool

    pool = ResultSaverPool(2)
    for i in range(5):
        pool.add_job(divmod, (i, 3))
    assert pool.drain() == [divmod(i, 3) for i in range(5)]
    # synchronous fallback
    pool = ResultSaverPool(1)
    pool.add_job(divmod, (7, 3))
    assert pool.drain() == [(2, 1)]


def test_nan_grad_tripwire_skips_update():
    """skip_nan_updates: non-finite grads leave params/opt_state untouched
    (reference trainer.py:356-363 equivalent, in-program)."""
    import jax
    import jax.numpy as jnp
    import optax

    from speech_editing_tpu.training.train_state import (TrainState,
                                                         make_train_step)

    def loss_fn(params, batch, rng):
        total = jnp.sum(params["w"] * batch["x"]) + 0.0 * batch["global_step"]
        return total, {}

    tx = optax.adam(1e-2)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    rng = jax.random.PRNGKey(0)

    bad = {"x": jnp.array([1.0, jnp.nan, 1.0, 1.0])}
    state1, m1 = step(state, bad, rng)
    assert float(m1["nan_grads"]) == 1.0
    assert np.allclose(np.asarray(state1.params["w"]), 1.0)  # unchanged
    assert int(state1.step) == 1  # step still advances (scheduler parity)
    mu = state1.opt_state[0].mu["w"] if hasattr(state1.opt_state[0], "mu") \
        else None
    if mu is not None:
        assert np.all(np.isfinite(np.asarray(mu)))

    good = {"x": jnp.ones((4,))}
    state2, m2 = step(state1, good, rng)
    assert float(m2["nan_grads"]) == 0.0
    assert not np.allclose(np.asarray(state2.params["w"]), 1.0)  # updated


def test_eval_loss_fn_is_deterministic(trained):
    """Validation must run the deterministic-dropout loss: same batch,
    different dropout seeds -> identical loss (train=False), while the
    train-mode loss varies with the dropout rng."""
    import jax

    hp, work_dir = trained
    hp = dict(hp, dropout=0.1, predictor_dropout=0.1)  # TINY_HP has 0.0
    task = SpecDenoiserTask(hp)
    model = task.build_model()
    rng = np.random.RandomState(0)
    t_frames, s_tok = 64, 10
    batch = {
        "txt_tokens": np.asarray(rng.randint(3, task.vocab_size, (1, s_tok))),
        "time_mel_masks": np.ones((1, t_frames), np.float32),
        "mel2ph": np.clip(np.sort(rng.randint(1, s_tok, (1, t_frames))),
                          1, s_tok),
        "mels": rng.randn(1, t_frames, 80).astype(np.float32),
        "f0": rng.rand(1, t_frames).astype(np.float32),
        "uv": np.zeros((1, t_frames), np.float32),
        "spk_embed": np.zeros((1, 256), np.float32),
    }
    variables = task.init_model(model, batch, jax.random.PRNGKey(0))
    params = variables["params"]

    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=1)
    def apply(k_drop, train):
        # fixed diffusion rng, varying dropout rng: isolates dropout. The
        # fft encoder has NO dropout by reference parity (FS_ENCODERS
        # builds FastSpeechEncoder without hp['dropout']; configs set
        # dropout: 0.0) — the dropout that matters sits in the duration/
        # pitch predictors (predictor_dropout), so probe `dur`.
        tm = jnp.asarray(batch["time_mel_masks"])[..., None]
        out = model.apply(
            {"params": params}, jnp.asarray(batch["txt_tokens"]), tm,
            jnp.asarray(batch["mel2ph"]), jnp.asarray(batch["spk_embed"]),
            jnp.asarray(batch["mels"]), jnp.asarray(batch["f0"]),
            jnp.asarray(batch["uv"]), infer=False,
            rng=jax.random.PRNGKey(7), train=train,
            rngs={"dropout": k_drop})
        return out["dur"]

    kA, kB = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    # eval mode: dropout deterministic -> output independent of dropout rng
    assert np.array_equal(apply(kA, False), apply(kB, False))
    # train mode: dropout active -> output depends on the dropout rng
    assert not np.array_equal(apply(kA, True), apply(kB, True))


def test_accum_step_matches_fused_step():
    """make_accum_train_step over N microbatches must equal make_train_step
    on the concatenated batch (mean-gradient equivalence), and surface the
    same nan_grads metric."""
    import jax
    import jax.numpy as jnp
    import optax

    from speech_editing_tpu.training.train_state import (TrainState,
                                                         make_accum_train_step,
                                                         make_train_step)

    def loss_fn(params, batch, rng):
        x = batch["x"]  # [B, D]
        pred = x @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss + 0.0 * batch["global_step"], {}

    tx = optax.sgd(0.1)
    rng = np.random.RandomState(0)
    w0 = rng.randn(4).astype(np.float32)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8).astype(np.float32)

    fused = make_train_step(loss_fn, tx)
    # the jitted steps donate their input state: give each path its own
    s0 = TrainState.create({"w": jnp.asarray(w0)}, tx)
    s_fused, _ = fused(s0, {"x": x, "y": y}, jax.random.PRNGKey(0))

    grad_fn, apply_fn = make_accum_train_step(loss_fn, tx)
    s1 = TrainState.create({"w": jnp.asarray(w0)}, tx)
    gsum = None
    for i in range(2):  # two equal microbatches of 4
        g, _ = grad_fn(s1.params, {"x": x[i * 4:(i + 1) * 4],
                                   "y": y[i * 4:(i + 1) * 4]},
                       jax.random.PRNGKey(0), 0.0)
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
    s_accum, m = apply_fn(s1, gsum, 2.0)
    assert float(m["nan_grads"]) == 0.0
    np.testing.assert_allclose(np.asarray(s_accum.params["w"]),
                               np.asarray(s_fused.params["w"]), atol=1e-6)
