"""Free-running TTS inference drivers (text -> mel -> wav)."""

import json
import os

import jax
import numpy as np
import pytest

from tests.helpers import TINY_HP


def _setup(tmp_path, extra_hp=None):
    """work_dir with a step-1 checkpoint + phone_set.json for an hp dict."""
    from speech_editing_tpu.training.checkpoint import save_checkpoint
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.train_state import TrainState

    phones = ["<pad>", "<EOS>", "<UNK>", "|", "<BOS>", "AH0", "HH", "L",
              "OW1", "W", "ER0", "D", "."]
    data_dir = tmp_path / "binary"
    data_dir.mkdir(exist_ok=True)
    (data_dir / "phone_set.json").write_text(json.dumps(phones))

    hp = dict(TINY_HP)
    hp.update(binary_data_dir=str(data_dir), work_dir=str(tmp_path / "wd"),
              vocoder="griffinlim", max_frames=64, audio_sample_rate=22050,
              use_spk_embed=False, language="en", seed=0)
    if extra_hp:
        hp.update(extra_hp)
    return hp, phones


def _save_ckpt(hp, model, init_fn):
    from speech_editing_tpu.training.checkpoint import save_checkpoint
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.train_state import TrainState

    variables = init_fn()
    state = TrainState.create(variables["params"], build_optimizer(hp))
    os.makedirs(hp["work_dir"], exist_ok=True)
    save_checkpoint(hp["work_dir"], state, steps=1)


def test_fastspeech_infer_text_to_wav(tmp_path):
    from speech_editing_tpu.infer.tts_infer import (FastSpeechInfer,
                                                    infer_cls_for)
    from speech_editing_tpu.models.fs import FastSpeech

    hp, phones = _setup(tmp_path, {"task_cls": "training.tasks.tts.FastSpeechTask"})
    assert infer_cls_for(hp) is FastSpeechInfer
    model = FastSpeech(len(phones), hp)
    txt = np.zeros((1, 4), np.int32) + 5
    _save_ckpt(hp, model, jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), txt, None, None, None, None, None,
        infer=True, use_pred_mel2ph=True, use_pred_pitch=True)))

    infer_ins = FastSpeechInfer(hp)
    wav, mel = infer_ins.infer_once({"text": "hello world"})
    assert mel.ndim == 2 and mel.shape[1] == 80 and mel.shape[0] >= 1
    assert np.isfinite(mel).all()
    assert len(wav) >= 1 and np.isfinite(np.asarray(wav)).all()


def test_diffspeech_infer_text_to_wav(tmp_path):
    from speech_editing_tpu.infer.tts_infer import (DiffSpeechInfer,
                                                    infer_cls_for)
    from speech_editing_tpu.models.diffspeech import DiffSpeech

    hp, phones = _setup(tmp_path, {
        "task_cls": "training.tasks.tts.DiffSpeechTask",
        "timesteps": 2, "spec_min": [-5.0] * 80, "spec_max": [0.0] * 80,
        "keep_bins": 80})
    assert infer_cls_for(hp) is DiffSpeechInfer
    model = DiffSpeech(len(phones), hp, out_dims=80)
    txt = np.zeros((1, 4), np.int32) + 5
    _save_ckpt(hp, model, jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        txt, infer=True, rng=jax.random.PRNGKey(2))))

    infer_ins = DiffSpeechInfer(hp)
    wav, mel = infer_ins.infer_once({"text": "hello"})
    assert mel.shape[1] == 80 and np.isfinite(mel).all()
    assert len(wav) >= 1
