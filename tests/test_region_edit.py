"""Region-edit CSV API: g2p, region resolution, duration inpainting, splice."""

import json
import os

import numpy as np
import pytest

from speech_editing_tpu.infer.infer_utils import (
    get_words_region_from_origintxt_region, parse_region_list_from_str)
from speech_editing_tpu.utils.text.processors import (get_txt_processor_cls,
                                                      txt_to_ph)
from tests.helpers import TINY_HP


def test_parse_region_list():
    assert parse_region_list_from_str("[4,6]") == [[4, 6]]
    assert parse_region_list_from_str("[9,9][2,3]") == [[2, 3], [9, 9]]


def test_txt_to_ph_structure():
    tp = get_txt_processor_cls("en")
    ph, txt, words, ph2word, ph_gb_word = txt_to_ph(tp, "this is a test")
    words_l = words.split(" ")
    assert words_l[0] == "<BOS>" and words_l[-1] == "<EOS>"
    assert "|" in words_l  # word boundaries
    assert len(ph.split(" ")) == len(ph2word)
    # 4 content words
    content = [w for w in words_l if w not in ("<BOS>", "<EOS>", "|")]
    assert content == ["this", "is", "a", "test"]


def test_words_region_resolution():
    tp = get_txt_processor_cls("en")
    _, _, words, _, _ = txt_to_ph(tp, "this is a test")
    words_l = words.split(" ")
    region = get_words_region_from_origintxt_region(words_l, [[2, 3]])[0]
    # positions are 1-based into the separator-bearing list
    assert words_l[region[0] - 1] == "is"
    assert words_l[region[1] - 1] == "a"


@pytest.fixture(scope="module")
def edit_env(tmp_path_factory):
    """Tiny trained-from-init checkpoint + phone_set covering the g2p output."""
    import jax

    from speech_editing_tpu.training.checkpoint import save_checkpoint
    from speech_editing_tpu.training.optim import build_optimizer
    from speech_editing_tpu.training.tasks.spec_denoiser import SpecDenoiserTask
    from speech_editing_tpu.training.train_state import TrainState

    tmp = tmp_path_factory.mktemp("edit")
    data_dir = str(tmp / "binary")
    work_dir = str(tmp / "work")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(work_dir, exist_ok=True)

    tp = get_txt_processor_cls("en")
    texts = ["this is a test sentence", "this is a wonderful test sentence"]
    phones = set()
    for t in texts:
        ph, *_ = txt_to_ph(tp, t)
        phones.update(ph.split(" "))
    json.dump(sorted(phones), open(f"{data_dir}/phone_set.json", "w"))

    hp = dict(TINY_HP)
    hp.update(binary_data_dir=data_dir, work_dir=work_dir, infer=True,
              use_spk_embed=True, f0_min=80, f0_max=600, language="en",
              vocoder="GriffinLim", seed=1234)
    task = SpecDenoiserTask(hp)
    model = task.build_model()
    rng = np.random.RandomState(0)
    t_frames, s_tok = 64, 10
    batch = {
        "txt_tokens": rng.randint(3, task.vocab_size, (1, s_tok)),
        "time_mel_masks": np.zeros((1, t_frames), np.float32),
        "mel2ph": np.clip(np.sort(rng.randint(1, s_tok, (1, t_frames))), 1, s_tok),
        "mels": rng.randn(1, t_frames, 80).astype(np.float32),
        "f0": rng.rand(1, t_frames).astype(np.float32),
        "uv": np.zeros((1, t_frames), np.float32),
        "spk_embed": np.zeros((1, 256), np.float32),
    }
    variables = task.init_model(model, batch, jax.random.PRNGKey(0))
    tx = build_optimizer(hp)
    state = TrainState.create(variables["params"], tx)
    save_checkpoint(work_dir, state, steps=1)
    return hp


def test_region_edit_end_to_end(edit_env):
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    hp = edit_env
    infer_ins = SpecDenoiserInfer(hp)

    # synthetic utterance
    sr, hop = 22050, 256
    t_ax = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 150 * t_ax)).astype(np.float32)
    n_frames = len(wav) // hop
    mel = (np.random.RandomState(0).randn(n_frames, 80) * 0.3 - 2).astype(np.float32)

    # precompute an even alignment over the original phones
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    mel2ph = np.minimum(np.arange(n_frames) * s // n_frames + 1, s)

    inp = {
        "item_name": "test_item",
        "text": "this is a test sentence",
        "edited_text": "this is a wonderful test sentence",
        "region": "[3,4]", "edited_region": "[3,5]",
        "mel": mel, "wav": wav, "mel2ph": mel2ph,
    }
    wav_out, wav_gt, mel_out, mel_gt, ref_mels, masked_mel_gt = \
        infer_ins.infer_once(inp)

    assert np.isfinite(mel_out).all()
    assert mel_out.shape[1] == 80
    # edited utterance has inserted a word: length may differ from source
    assert mel_out.shape[0] > 0
    assert np.isfinite(wav_out).all() and len(wav_out) > 0
    # head frames (before edit region) must be preserved from the source
    head = 3  # first frames belong to <BOS>/'this'
    assert np.allclose(mel_out[:head], mel_gt[:head], atol=1e-5)
