"""In-place editor inference drivers (CampNet / A3T / EditSpeech)."""

import json
import os

import numpy as np
import pytest

from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                      txt_to_ph)
from tests.helpers import TINY_HP


@pytest.fixture(scope="module")
def infer_env(tmp_path_factory):
    import jax

    from speech_editing_tpu.training.checkpoint import save_checkpoint
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.train_state import TrainState

    tmp = tmp_path_factory.mktemp("editors")
    data_dir = str(tmp / "binary")
    os.makedirs(data_dir, exist_ok=True)
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    json.dump(sorted(set(ph.split(" "))), open(f"{data_dir}/phone_set.json", "w"))

    def make_env(task_cls_path, name):
        import importlib

        mod_name, cls_name = task_cls_path.rsplit(".", 1)
        task_cls = getattr(importlib.import_module(mod_name), cls_name)
        work_dir = str(tmp / f"work_{name}")
        os.makedirs(work_dir, exist_ok=True)
        hp = dict(TINY_HP)
        hp.update(binary_data_dir=data_dir, work_dir=work_dir, infer=True,
                  use_spk_embed=False, f0_min=80, f0_max=600, language="en",
                  vocoder="GriffinLim", seed=1)
        task = task_cls(hp)
        model = task.build_model()
        rs = np.random.RandomState(0)
        t, s = 64, 10
        batch = {
            "txt_tokens": rs.randint(3, task.vocab_size, (1, s)),
            "time_mel_masks": np.zeros((1, t), np.float32),
            "mel2ph": np.clip(np.sort(rs.randint(1, s, (1, t))), 1, s),
            "mels": rs.randn(1, t, 80).astype(np.float32),
            "f0": rs.rand(1, t).astype(np.float32),
            "uv": np.zeros((1, t), np.float32),
        }
        variables = task.init_model(model, batch, jax.random.PRNGKey(0))
        state = TrainState.create(variables["params"], build_optimizer(hp))
        save_checkpoint(work_dir, state, steps=1)
        return hp

    return make_env


def _edit_input(hp):
    tp = get_txt_processor_cls("en")
    sr, hop = 22050, 256
    wav = (0.3 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(np.float32)
    n = len(wav) // hop
    mel = (np.random.RandomState(0).randn(n, 80) * 0.3 - 2).astype(np.float32)
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    mel2ph = np.minimum(np.arange(n) * s // n + 1, s)
    return {"item_name": "x", "text": "this is a test sentence",
            "edited_text": "this is a test sentence",
            "region": "[3,4]", "edited_region": "[3,4]",
            "mel": mel, "wav": wav, "mel2ph": mel2ph}


@pytest.mark.parametrize("task_path,infer_cls_name", [
    ("speech_editing_tpu.training.tasks.campnet.CampNetTask", "CampNetInfer"),
    ("speech_editing_tpu.training.tasks.a3t.A3TTask", "A3TInfer"),
    ("speech_editing_tpu.training.tasks.editspeech.EditSpeechTask",
     "EditSpeechInfer"),
])
def test_inplace_editor_infer(infer_env, task_path, infer_cls_name):
    import speech_editing_tpu.infer.editors as editors

    hp = infer_env(task_path, infer_cls_name)
    infer_ins = getattr(editors, infer_cls_name)(hp)
    inp = _edit_input(hp)
    wav_out, wav_gt, mel_out, mel_gt, *_ = infer_ins.infer_once(inp)
    assert mel_out.shape == mel_gt.shape  # in-place edit: same frame grid
    assert np.isfinite(mel_out).all() and len(wav_out) > 0
    # region frames changed, outside preserved
    tm = infer_ins._frame_mask(infer_ins.preprocess_input(inp))
    assert np.allclose(mel_out[tm == 0], mel_gt[tm == 0], atol=1e-5)
    assert np.abs(mel_out[tm == 1] - mel_gt[tm == 1]).mean() > 1e-4
