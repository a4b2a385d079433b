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


def test_lengthening_edit_not_truncated(edit_env):
    """A long insertion into a very short source: the predicted edit region
    must not be clipped at the source frame count (the jitted length
    regulator runs at a static budget; regulation happens host-side at the
    full predicted length, matching reference fs.py:149 dynamic behavior)."""
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    hp = dict(edit_env)
    infer_ins = SpecDenoiserInfer(hp)

    sr, hop = 22050, 256
    n_frames = 12  # tiny source: any real insertion predicts more frames
    wav = (0.3 * np.sin(2 * np.pi * 150 *
                        np.arange(n_frames * hop) / sr)).astype(np.float32)
    mel = (np.random.RandomState(1).randn(n_frames, 80) * 0.3 - 2
           ).astype(np.float32)
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    mel2ph = np.minimum(np.arange(n_frames) * s // n_frames + 1, s)

    item = infer_ins.preprocess_input({
        "item_name": "tiny",
        "text": "this is a test sentence",
        "edited_text": "this is a wonderful magnificent extraordinary "
                       "test sentence",
        "region": "[3,4]", "edited_region": "[3,7]",
        "mel": mel, "wav": wav, "mel2ph": mel2ph,
    })
    spk = infer_ins.spk_embedder(item["wav"])[None]
    pred_m2p, pred_m2w, edit_frames = infer_ins.inpaint_durations(item, spk)

    # full predicted length, never bounded by the 12-frame source
    # (~40 edited phones at >=1 predicted frame each under the seeded init)
    assert len(pred_m2p) > n_frames
    assert len(pred_m2p) == len(pred_m2w)
    assert pred_m2p.max() <= len(item["edited_ph2word"])
    assert (np.diff(pred_m2p) >= 0).all()  # monotone frame->phone map

    # end-to-end still composes a finite output with the full edit span
    wav_out, _, mel_out, *_ = infer_ins.forward_model(item)
    c0, c1 = item["edited_words_region"][0]
    n_new = int(((pred_m2w >= c0) & (pred_m2w <= c1)).sum())
    head = int(np.sum(item["mel2word"] < item["words_region"][0][0]))
    tail = int(np.sum(item["mel2word"] > item["words_region"][0][1]))
    assert mel_out.shape[0] == head + n_new + tail
    assert np.isfinite(mel_out).all() and np.isfinite(wav_out).all()


def test_shortening_edit_zero_changed_frames(edit_env):
    """Shortening edit where the untrained predictor may emit ZERO frames for
    the changed words: the tail phone ids must map 1:1 onto the edited
    sequence's tail block (never overrun S_edit -> NaN via OOB gather fill),
    and the composite must stay finite."""
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    hp = dict(edit_env)
    infer_ins = SpecDenoiserInfer(hp)

    sr, hop, n_frames = 22050, 256, 80
    wav = (0.3 * np.sin(2 * np.pi * 150 *
                        np.arange(n_frames * hop) / sr)).astype(np.float32)
    mel = (np.random.RandomState(7).randn(n_frames, 80) * 0.3 - 2
           ).astype(np.float32)
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    mel2ph = np.minimum(np.arange(n_frames) * s // n_frames + 1, s)

    item = infer_ins.preprocess_input({
        "item_name": "shorten",
        "text": "this is a test sentence",
        "edited_text": "this is short",
        "region": "[3,5]", "edited_region": "[3,3]",
        "mel": mel, "wav": wav, "mel2ph": mel2ph,
    })
    wav_out, _, mel_out, mel_gt, ref_mels, _ = infer_ins.forward_model(item)
    assert np.isfinite(mel_out).all() and np.isfinite(wav_out).all()
    # shortening: output must be shorter than the source
    assert 0 < mel_out.shape[0] < n_frames
    # head preserved bit-exact outside the mask
    head = int(np.sum(item["mel2word"] < item["words_region"][0][0]))
    assert np.allclose(mel_out[:min(head, 5)], mel_gt[:min(head, 5)], atol=1e-5)


def test_example_run_csv_driver(edit_env, tmp_path):
    """The CSV batch driver end-to-end (no MFA: rows carry precomputed
    mel2ph): wav2spec kwargs must match, wavs must be written."""
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer
    from speech_editing_tpu.utils.audio.io import save_wav

    hp = dict(edit_env)
    sr, hop, n_frames = 22050, 256, 40
    wav = (0.3 * np.sin(2 * np.pi * 150 *
                        np.arange(n_frames * hop) / sr)).astype(np.float32)
    wav_fn = str(tmp_path / "src.wav")
    save_wav(wav, wav_fn, sr)

    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    # example_run recomputes the mel from the wav file; frame count may
    # differ by edge padding, so build mel2ph generously long and let
    # preprocess_input truncate via the mel length
    t_max = n_frames + 8
    mel2ph = np.minimum(np.arange(t_max) * s // t_max + 1, s)

    rows = [{
        "item_name": "csv_item",
        "text": "this is a test sentence",
        "edited_text": "this is a wonderful test sentence",
        "region": "[3,4]", "edited_region": "[3,5]",
        "wav_fn_orig": wav_fn, "mel2ph": mel2ph,
    }]
    out_dir = str(tmp_path / "out")
    SpecDenoiserInfer.example_run(rows, hp, out_dir=out_dir)
    assert os.path.exists(f"{out_dir}/csv_item.wav")
    assert os.path.exists(f"{out_dir}/csv_item_ref.wav")


def test_frames_multiple_grid(edit_env):
    """With frames_multiple>1 the model clips mel2ph to the multiple — the
    spliced ref/f0/uv/mask arrays must ride the same floored grid."""
    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer

    hp = dict(edit_env)
    hp["frames_multiple"] = 4
    infer_ins = SpecDenoiserInfer(hp)

    sr, hop, n_frames = 22050, 256, 61  # deliberately not a multiple of 4
    wav = (0.3 * np.sin(2 * np.pi * 150 *
                        np.arange(n_frames * hop) / sr)).astype(np.float32)
    mel = (np.random.RandomState(3).randn(n_frames, 80) * 0.3 - 2
           ).astype(np.float32)
    tp = get_txt_processor_cls("en")
    ph, *_ = txt_to_ph(tp, "this is a test sentence")
    s = len(ph.split(" "))
    mel2ph = np.minimum(np.arange(n_frames) * s // n_frames + 1, s)

    wav_out, _, mel_out, *_ = infer_ins.infer_once({
        "item_name": "fm4",
        "text": "this is a test sentence",
        "edited_text": "this is a wonderful test sentence",
        "region": "[3,4]", "edited_region": "[3,5]",
        "mel": mel, "wav": wav, "mel2ph": mel2ph,
    })
    assert mel_out.shape[0] % 4 == 0
    assert np.isfinite(mel_out).all() and np.isfinite(wav_out).all()
