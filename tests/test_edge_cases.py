"""Edge-case probes from the verify recipe: full mask, zero mask, single
token, odd frame counts, best-checkpoint retention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_editing_tpu.training.tasks.spec_denoiser import SpecDenoiserTask
from tests.helpers import TINY_HP, VOCAB


def _batch(t, s, mask_mode, rng):
    txt = rng.randint(3, VOCAB, (1, s)).astype(np.int32)
    mel2ph = np.minimum(np.sort(rng.randint(1, s + 1, (1, t))), s).astype(np.int32)
    mask = np.zeros((1, t), np.float32)
    if mask_mode == "full":
        mask[:] = 1.0
    elif mask_mode == "half":
        mask[:, t // 2:] = 1.0
    return {
        "txt_tokens": txt, "mel2ph": mel2ph,
        "mels": (rng.randn(1, t, 80) * 0.5).astype(np.float32),
        "f0": rng.rand(1, t).astype(np.float32),
        "uv": np.zeros((1, t), np.float32),
        "time_mel_masks": mask,
    }


@pytest.fixture(scope="module")
def editor():
    hp = dict(TINY_HP, vocab_size=VOCAB, binary_data_dir="",
              use_spk_embed=False)
    task = SpecDenoiserTask(hp)
    model = task.build_model()
    return task, model


@pytest.mark.parametrize("t,s,mask_mode", [
    (16, 1, "half"),    # single token
    (17, 5, "half"),    # odd frame count
    (16, 5, "full"),    # whole utterance masked
    (16, 5, "zero"),    # nothing masked
])
def test_editor_edge_shapes(editor, t, s, mask_mode, rng):
    task, model = editor
    b = _batch(t, s, mask_mode, rng)
    variables = task.init_model(model, b, jax.random.PRNGKey(0))
    bj = {k: jnp.asarray(v) for k, v in b.items()}
    loss_fn = task.make_loss_fn(model)
    (total, metrics) = jax.jit(loss_fn)(variables["params"], bj,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(total)), (mask_mode, metrics)
    infer_fn = task.build_infer_fn(model)
    out = infer_fn(variables, bj, jax.random.PRNGKey(2))
    mel_out = np.asarray(out["mel_out"])
    assert mel_out.shape == (1, t, 80)
    assert np.isfinite(mel_out).all()
    tm = b["time_mel_masks"][0]
    if mask_mode == "zero":  # nothing regenerated
        assert np.allclose(mel_out[0], b["mels"][0], atol=1e-5)
    else:  # unmasked region preserved exactly
        assert np.allclose(mel_out[0][tm == 0], b["mels"][0][tm == 0],
                           atol=1e-5)


def test_best_checkpoint_retention(tmp_path):
    from speech_editing_tpu.training.checkpoint import (load_checkpoint,
                                                        save_checkpoint)

    class S:  # minimal pytree
        pass

    state = {"w": np.ones(3)}
    d = str(tmp_path)
    save_checkpoint(d, state, steps=1, val_loss=5.0, save_best=True)
    save_checkpoint(d, state, steps=2, val_loss=3.0, save_best=True)
    save_checkpoint(d, state, steps=3, val_loss=4.0, save_best=True)
    best = load_checkpoint(f"{d}/model_ckpt_best.pt")
    assert best["val_loss"] == 3.0 and best["steps"] == 2
    # a stored val_loss of 0.0 is a VALID best, not "no best yet"
    save_checkpoint(d, state, steps=4, val_loss=0.0, save_best=True)
    save_checkpoint(d, state, steps=5, val_loss=2.0, save_best=True)
    best = load_checkpoint(f"{d}/model_ckpt_best.pt")
    assert best["val_loss"] == 0.0 and best["steps"] == 4


def test_rolling_retention(tmp_path):
    from speech_editing_tpu.training.checkpoint import (get_all_ckpts,
                                                        save_checkpoint)

    state = {"w": np.ones(3)}
    for s in range(1, 6):
        save_checkpoint(str(tmp_path), state, steps=s, num_ckpt_keep=2)
    ckpts = get_all_ckpts(str(tmp_path))
    assert len(ckpts) == 2
    assert "steps_5" in ckpts[0] and "steps_4" in ckpts[1]
