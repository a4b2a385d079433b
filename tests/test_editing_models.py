"""CampNet / A3T / EditSpeech: shapes, jit, loss grads, composite contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_editing_tpu.training.tasks.a3t import A3TTask
from speech_editing_tpu.training.tasks.campnet import CampNetTask
from speech_editing_tpu.training.tasks.editspeech import EditSpeechTask
from speech_editing_tpu.models.editspeech import bidirectional_fusion
from tests.helpers import TINY_HP, VOCAB, synth_batch


def _hp(**kw):
    hp = dict(TINY_HP)
    hp["vocab_size"] = VOCAB
    hp["binary_data_dir"] = ""
    hp.update(kw)
    return hp


@pytest.mark.parametrize("task_cls", [CampNetTask, A3TTask, EditSpeechTask])
def test_task_train_and_infer(task_cls, rng):
    hp = _hp()
    task = task_cls(hp)
    model = task.build_model()
    batch_np = synth_batch(rng, B=2, S=8, T=64)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    variables = task.init_model(model, batch_np, jax.random.PRNGKey(0))
    loss_fn = task.make_loss_fn(model)
    (total, metrics), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables["params"], batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), metrics
    gnorm = float(jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(x ** 2)), grads, 0.0))
    assert gnorm > 0, "no gradient flow"

    infer_fn = task.build_infer_fn(model)
    out = infer_fn(variables, batch, jax.random.PRNGKey(2))
    mel_out = np.asarray(out["mel_out"])
    assert mel_out.shape == batch_np["mels"].shape
    assert np.isfinite(mel_out).all()
    # composite contract: outside-mask frames identical to the source
    tm = batch_np["time_mel_masks"]
    outside = tm == 0
    assert np.allclose(mel_out[outside], batch_np["mels"][outside], atol=1e-5)
    # inside-mask frames actually regenerated
    assert np.abs(mel_out[tm == 1] - batch_np["mels"][tm == 1]).mean() > 1e-4


def test_bidirectional_fusion_splice():
    b, t, m = 1, 20, 4
    fwd = np.zeros((b, t, m), np.float32)
    bwd = np.ones((b, t, m), np.float32)
    # distance is constant; make frame 12 the clear fusion point
    bwd[0, 12] = 0.001
    mels = np.full((b, t, m), 5.0, np.float32)
    tm = np.zeros((b, t, 1), np.float32)
    tm[0, 8:16] = 1.0
    out = np.asarray(bidirectional_fusion(
        jnp.asarray(fwd), jnp.asarray(bwd), jnp.asarray(mels), jnp.asarray(tm)))
    assert np.allclose(out[0, :8], 5.0)  # gt outside mask
    assert np.allclose(out[0, 16:], 5.0)
    assert np.allclose(out[0, 8:12], 0.0)  # forward before fusion point
    assert np.allclose(out[0, 12:16, :], bwd[0, 12:16])  # backward after


def test_editspeech_teacher_forcing_branches(rng):
    hp = _hp()
    task = EditSpeechTask(hp)
    model = task.build_model()
    batch_np = synth_batch(rng, B=2, S=8, T=48)
    variables = task.init_model(model, batch_np, jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    tm = batch["time_mel_masks"][..., None]

    @jax.jit
    def _fwd(rng_key):
        out = model.apply(variables, batch["txt_tokens"], tm, batch["mel2ph"],
                          batch["spk_embed"], batch["mels"], batch["f0"],
                          batch["uv"], infer=False, rng=rng_key,
                          rngs={"dropout": jax.random.PRNGKey(9)})
        return out["forward_outputs"]

    def fwd(rng_key):
        return np.asarray(_fwd(rng_key))

    # different coin flips -> different decoder inputs -> different outputs
    outs = {fwd(jax.random.PRNGKey(i)).tobytes() for i in range(6)}
    assert len(outs) == 2, "teacher-forcing flip should yield 2 distinct paths"
