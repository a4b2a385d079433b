"""Offline pipeline: raw corpus -> preprocess -> (synthetic align) -> binarize
-> dataset -> one train step. The MFA step is replaced by generated
TextGrids (MFA is an external binary; the TextGrid parser is the contract)."""

import json
import os

import numpy as np
import pytest

from speech_editing_tpu.data.binarizer import BaseBinarizer
from speech_editing_tpu.data.preprocess import BasePreprocessor
from speech_editing_tpu.data.datasets import EditingDataset
from speech_editing_tpu.utils.audio.io import save_wav
from speech_editing_tpu.utils.text.text_encoder import is_sil_phoneme


def _write_textgrid(path, phones, total_sec):
    """Long-form Praat TextGrid with words+phones tiers (MFA layout)."""
    n = len(phones)
    bounds = np.linspace(0, total_sec, n + 1)
    lines = [
        'File type = "ooTextFile"', 'Object class = "TextGrid"', "",
        "xmin = 0", f"xmax = {total_sec}", "tiers? <exists>", "size = 2",
        "item []:",
        "    item [1]:", '        class = "IntervalTier"',
        '        name = "words"', "        xmin = 0",
        f"        xmax = {total_sec}", "        intervals: size = 1",
        "        intervals [1]:", "            xmin = 0",
        f"            xmax = {total_sec}", '            text = "w"',
        "    item [2]:", '        class = "IntervalTier"',
        '        name = "phones"', "        xmin = 0",
        f"        xmax = {total_sec}", f"        intervals: size = {n}",
    ]
    for i, p in enumerate(phones):
        lines += [f"        intervals [{i + 1}]:",
                  f"            xmin = {bounds[i]:.6f}",
                  f"            xmax = {bounds[i + 1]:.6f}",
                  f'            text = "{p}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    raw = tmp / "raw" / "vctk"
    texts = ["hello world", "speech editing works", "one two three",
             "this is data", "more audio here", "final test case"]
    sr = 22050
    for i, txt in enumerate(texts):
        spk = f"p{225 + i % 2}"
        (raw / "wav48" / spk).mkdir(parents=True, exist_ok=True)
        (raw / "txt" / spk).mkdir(parents=True, exist_ok=True)
        t = np.arange(int(sr * 1.2)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        save_wav(wav, str(raw / "wav48" / spk / f"utt{i}.wav"), sr)
        with open(raw / "txt" / spk / f"utt{i}.txt", "w") as f:
            f.write(txt)
    return str(tmp), str(raw)


def test_full_offline_pipeline(corpus_dirs):
    tmp, raw = corpus_dirs
    processed = f"{tmp}/processed/vctk"
    binary = f"{tmp}/binary/vctk"
    hp = {
        "ds_name": "vctk", "raw_data_dir": raw, "processed_data_dir": processed,
        "binary_data_dir": binary, "use_mfa": True, "num_spk": 10,
        "with_spk_embed": True, "valid_range": [0, 2], "test_range": [0, 2],
        "train_range": [2, -1], "min_mel_length": 10,
    }
    os.environ["N_PROC"] = "1"  # in-process for test determinism

    # 1. preprocess
    items = BasePreprocessor(hp).process()
    assert len(items) == 6
    assert os.path.exists(f"{processed}/phone_set.json")
    assert os.path.exists(f"{processed}/word_set.json")
    assert os.path.exists(f"{processed}/spk_map.json")
    assert os.path.exists(f"{processed}/mfa_dict.txt")
    assert os.path.exists(f"{processed}/metadata.json")
    # mfa inputs staged with .lab files
    labs = [f for _, _, fs in os.walk(f"{processed}/mfa_inputs") for f in fs
            if f.endswith(".lab")]
    assert len(labs) == 6

    # 2. fake the MFA output: TextGrids matching each item's phones
    meta = json.load(open(f"{processed}/metadata.json"))
    os.makedirs(f"{processed}/mfa_outputs", exist_ok=True)
    for it in meta:
        phones = [p for p in it["ph"].split(" ")]
        # TextGrid contains non-sil phones; silences in ph map to TextGrid sil
        tg_phones = [p if not is_sil_phoneme(p) else "" for p in phones]
        _write_textgrid(f"{processed}/mfa_outputs/{it['item_name']}.TextGrid",
                        tg_phones, total_sec=1.2)

    # 3. one-command driver: re-runs preprocess (idempotent), skips MFA
    # (TextGrids already present), binarizes — the align_and_binarize.py
    # parity surface (reference data_gen/tts/runs/align_and_binarize.py)
    from speech_editing_tpu.data.align_and_binarize import align_and_binarize

    align_and_binarize(hp)
    for prefix in ("train", "valid", "test"):
        assert os.path.exists(f"{binary}/{prefix}.data")
        assert os.path.exists(f"{binary}/{prefix}_lengths.npy")
    assert os.path.exists(f"{binary}/phone_set.json")

    # 4. dataset consumes it
    ds_hp = {"binary_data_dir": binary, "use_spk_embed": True,
             "use_spk_id": False, "use_pitch_embed": True, "infer": False,
             "max_frames": 200, "max_input_tokens": 80, "seed": 1,
             "mask_type": "alignment_aware", "training_mask_ratio": 0.8,
             "sort_by_len": True, "test_ids": [], "min_frames": 0,
             "frames_multiple": 1}
    ds = EditingDataset("train", ds_hp, shuffle=False)
    assert len(ds) == 4
    s = ds[0]
    assert s["mel"].shape[1] == 80
    assert s["mel2ph"].max() <= len(json.load(open(f"{binary}/phone_set.json"))) + 10
    assert s["spk_embed"].shape == (256,)
    assert (s["f0"] != 0).any()
    batch = ds.collater([ds[0], ds[1]])
    assert batch["mels"].shape[0] == 2


def test_binarizer_trim_eos_bos(tmp_path):
    """With ``trim_eos_bos: true`` the BOS/EOS-aligned frames are dropped
    from mel/mel2ph/mel2word/dur/dur_word/wav and f0 stays frame-aligned
    (reference base_binarizer.py:157-167)."""
    sr = 22050
    raw = tmp_path / "raw" / "vctk"
    for i, txt in enumerate(["hello world", "two words"]):
        spk = "p225"
        (raw / "wav48" / spk).mkdir(parents=True, exist_ok=True)
        (raw / "txt" / spk).mkdir(parents=True, exist_ok=True)
        t = np.arange(int(sr * 1.2)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (160 + 20 * i) * t)).astype(np.float32)
        save_wav(wav, str(raw / "wav48" / spk / f"utt{i}.wav"), sr)
        (raw / "txt" / spk / f"utt{i}.txt").write_text(txt)
    processed = str(tmp_path / "processed/vctk")
    hp = {"ds_name": "vctk", "raw_data_dir": str(raw),
          "processed_data_dir": processed, "use_mfa": True, "num_spk": 4,
          "with_spk_embed": False, "with_wav": True, "valid_range": [0, 1],
          "test_range": [0, 1], "train_range": [1, -1], "min_mel_length": 10}
    os.environ["N_PROC"] = "1"
    BasePreprocessor(hp).process()
    meta = json.load(open(f"{processed}/metadata.json"))
    os.makedirs(f"{processed}/mfa_outputs", exist_ok=True)
    for it in meta:
        phones = it["ph"].split(" ")
        tg_phones = [p if not is_sil_phoneme(p) else "" for p in phones]
        _write_textgrid(f"{processed}/mfa_outputs/{it['item_name']}.TextGrid",
                        tg_phones, total_sec=1.2)

    def binarize(trim, out):
        h = dict(hp, binary_data_dir=str(tmp_path / out), trim_eos_bos=trim)
        BaseBinarizer(h).process()
        from speech_editing_tpu.data.indexed_dataset import IndexedDataset

        return IndexedDataset(str(tmp_path / out / "train"))[0]

    plain = binarize(False, "bin_plain")
    trimmed = binarize(True, "bin_trim")
    n_bos, n_eos = plain["dur"][0], plain["dur"][-1]
    assert n_bos + n_eos > 0  # corpus has aligned BOS/EOS frames to trim
    assert len(trimmed["mel"]) == len(plain["mel"]) - n_bos - n_eos
    assert len(trimmed["mel2ph"]) == len(trimmed["mel"])
    assert len(trimmed["mel2word"]) == len(trimmed["mel"])
    assert list(trimmed["dur"]) == list(plain["dur"])[1:-1]
    assert list(trimmed["dur_word"]) == list(plain["dur_word"])[1:-1]
    assert len(trimmed["f0"]) == len(trimmed["mel"])
    assert trimmed["len"] == len(trimmed["mel"])
    hop = 256
    assert abs(len(trimmed["wav"]) -
               (len(plain["wav"]) - (n_bos + n_eos) * hop)) <= hop
    # interior mel frames are the same audio, shifted by the BOS trim
    np.testing.assert_allclose(np.asarray(trimmed["mel"][:8], np.float32),
                               np.asarray(plain["mel"][n_bos:n_bos + 8],
                                          np.float32), atol=1e-4)


@pytest.mark.parametrize("encoding", ["utf-16", "latin-1", "utf-8-sig"])
def test_textgrid_non_utf8_encodings(tmp_path, encoding):
    """Non-UTF-8 TextGrids (some MFA/locale combinations) parse via BOM /
    chardet sniffing (reference utils/text/encoding.py behavior)."""
    from speech_editing_tpu.utils.audio.align import read_textgrid

    tg = tmp_path / "enc.TextGrid"
    _write_textgrid(str(tg), ["", "AH", "B", ""], total_sec=1.0)
    # non-ascii word mark so non-utf8 encodings produce non-utf8 bytes
    text = tg.read_text(encoding="utf-8").replace('text = "w"',
                                                  'text = "wörd"')
    tg.write_bytes(text.encode(encoding))
    tiers = read_textgrid(str(tg))  # must parse, not crash
    marks = [iv.mark for iv in tiers["phones"]]
    assert marks == ["", "AH", "B", ""]
    if encoding != "latin-1":  # latin-1 fidelity needs chardet (optional)
        assert tiers["words"][0].mark == "wörd"


def test_get_mel2ph_trailing_extra_silence(tmp_path):
    """More trailing silence intervals in the TextGrid than silence phones
    in ph: extra sils fold onto the last phone instead of IndexError-ing."""
    from speech_editing_tpu.utils.audio.align import get_mel2ph

    sr, hop = 22050, 256
    # TextGrid: sil AH B sil sil vs ph: <BOS> AH B <EOS> (one extra sil)
    tg = str(tmp_path / "x.TextGrid")
    _write_textgrid(tg, ["", "AH", "B", "", ""], total_sec=1.0)
    mel = np.zeros((int(1.0 * sr) // hop, 80), np.float32)
    mel2ph, dur = get_mel2ph(tg, "<BOS> AH B <EOS>", mel, hop, sr)
    mel2ph = np.asarray(mel2ph)
    assert (mel2ph > 0).all()
    assert mel2ph.max() == 4  # trailing extra sil folded onto <EOS>
    assert sum(dur) == len(mel2ph)
