"""Data layer tests: indexed records, collation, bucketing, masks, datasets."""

import time

import numpy as np
import pytest

from speech_editing_tpu.data import (BaseSpeechDataset, DataLoader,
                                     EditingDataset, IndexedDataset,
                                     IndexedDatasetBuilder, batch_by_size,
                                     collate_1d, collate_2d,
                                     generate_alignment_aware_time_mask,
                                     generate_inference_mask,
                                     generate_time_mask)
from tests.helpers import TINY_HP, write_synth_corpus


def test_indexed_dataset_roundtrip(tmp_path, rng):
    path = str(tmp_path / "ds")
    items = [{"a": rng.randn(50, 8), "name": f"x{i}"} for i in range(20)]
    b = IndexedDatasetBuilder(path)
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(path)
    assert len(ds) == 20
    for i in (0, 7, 19, 7):
        assert np.array_equal(ds[i]["a"], items[i]["a"])
        assert ds[i]["name"] == items[i]["name"]
    with pytest.raises(IndexError):
        ds[20]
    # idx file format is np.save'd offsets dict (reference-compatible)
    offs = np.load(path + ".idx", allow_pickle=True).item()["offsets"]
    assert offs[0] == 0 and len(offs) == 21


def test_collate_padding_and_multiple():
    vals = [np.ones(5), np.ones(3)]
    out = collate_1d(vals, pad_idx=0)
    assert out.shape == (2, 5) and out[1, 3:].sum() == 0
    out = collate_1d(vals, size_multiple=8)
    assert out.shape == (2, 8)
    v2 = [np.ones((5, 4)), np.ones((2, 4))]
    out2 = collate_2d(v2, size_multiple=4)
    assert out2.shape == (2, 8, 4)
    assert out2[1, 2:].sum() == 0


def test_batch_by_size_budget():
    sizes = {i: 10 * (i + 1) for i in range(10)}
    batches = batch_by_size(list(range(10)), lambda i: sizes[i],
                            max_tokens=100, max_sentences=4)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(10))
    for b in batches:
        assert len(b) <= 4
        assert len(b) * max(sizes[i] for i in b) <= 100 or len(b) == 1


def test_time_masks(rng):
    m = generate_time_mask(100, 0.3, rng)
    assert m.shape == (100,) and m.sum() == 30
    # contiguous
    on = np.where(m == 1)[0]
    assert (np.diff(on) == 1).all()

    mel2ph = np.repeat(np.arange(1, 11), 10)  # 10 phones x 10 frames
    am = generate_alignment_aware_time_mask(mel2ph, 0.5, rng)
    assert am.shape == (100,)
    # mask follows phone boundaries: within each phone the mask is constant
    for p in range(1, 11):
        seg = am[mel2ph == p]
        assert (seg == seg[0]).all()

    im = generate_inference_mask(mel2ph, 0.5, rng)
    on_ph = np.unique(mel2ph[im == 1])
    assert len(on_ph) == 5  # 50% of 10 phones
    assert (np.diff(on_ph) == 1).all()  # contiguous phone span


@pytest.fixture
def corpus(tmp_path, rng):
    data_dir = str(tmp_path / "binary")
    items = write_synth_corpus(data_dir, rng, n_items=8)
    hp = dict(TINY_HP)
    hp.update(binary_data_dir=data_dir, infer=False, seed=1234,
              mask_type="alignment_aware", training_mask_ratio=0.8,
              max_frames=200, max_input_tokens=50, sort_by_len=True,
              test_ids=[], min_frames=0)
    return data_dir, items, hp


def test_base_speech_dataset(corpus):
    data_dir, items, hp = corpus
    ds = BaseSpeechDataset("train", hp, shuffle=True)
    assert len(ds) == 8
    s = ds[0]
    assert s["mel"].shape[1] == 80
    assert s["txt_token"].dtype == np.int64
    batch = ds.collater([ds[0], ds[1], ds[2]])
    assert batch["mels"].shape[0] == 3
    assert batch["txt_tokens"].shape[0] == 3
    assert batch["spk_embed"].shape == (3, 256)


def test_editing_dataset_and_loader(corpus):
    data_dir, items, hp = corpus
    ds = EditingDataset("train", hp, shuffle=True)
    s = ds[0]
    assert set(s) >= {"mel", "mel2ph", "f0", "uv", "time_mel_mask"}
    t = s["mel"].shape[0]
    assert s["time_mel_mask"].shape == (t,)
    assert 0 < s["time_mel_mask"].sum() <= t

    # per-item rng reproducible within an epoch, different across epochs
    m1 = ds[0]["time_mel_mask"]
    m2 = ds[0]["time_mel_mask"]
    assert np.array_equal(m1, m2)
    ds.set_epoch(1)
    m3 = ds[0]["time_mel_mask"]
    assert not np.array_equal(m1, m3)
    ds.set_epoch(0)

    loader = DataLoader(ds, max_tokens=400, max_sentences=4)
    batches = list(loader)
    seen = sum(b["nsamples"] for b in batches)
    assert seen == len(ds)
    for b in batches:
        assert b["mels"].shape[:2] == b["time_mel_masks"].shape
        assert b["mel2ph"].shape == b["f0"].shape


def test_loader_endless_epochs(corpus):
    data_dir, items, hp = corpus
    ds = EditingDataset("valid", hp, shuffle=False)
    loader = DataLoader(ds, max_sentences=4, endless=True)
    it = iter(loader)
    n_one_epoch = len(list(DataLoader(ds, max_sentences=4)))
    got = [next(it) for _ in range(n_one_epoch + 1)]  # crosses epoch boundary
    assert len(got) == n_one_epoch + 1


def test_weighted_sampler_oversamples_stutter(tmp_path, rng):
    """use_weighted_sampler: items with stutter frames appear more often
    (reference stutter_predictor.py:213-225, opt-in), and repeated draws of
    one item get DIFFERENT random masks (virtual-index rng keying)."""
    from speech_editing_tpu.data.indexed_dataset import IndexedDatasetBuilder
    from tests.helpers import synth_corpus_items

    data_dir = str(tmp_path / "binary")
    import os
    os.makedirs(data_dir)
    items = synth_corpus_items(rng, n_items=8)
    for i, it in enumerate(items):
        t = len(it["mel"])
        mask = np.zeros(t, np.int64)
        if i < 2:  # only the first two items contain stutter frames
            mask[: t // 2] = 1
        it["stutter_mel_mask"] = mask
    builder = IndexedDatasetBuilder(f"{data_dir}/train")
    for it in items:
        builder.add_item(it)
    builder.finalize()
    np.save(f"{data_dir}/train_lengths.npy",
            np.asarray([len(it["mel"]) for it in items]))

    hp = dict(TINY_HP)
    hp.update(binary_data_dir=data_dir, infer=False, seed=1,
              mask_type="random", training_mask_ratio=0.5,
              max_frames=200, max_input_tokens=50, test_ids=[], min_frames=0,
              use_weighted_sampler=True)
    ds = EditingDataset("train", hp, shuffle=True)
    w = ds.sample_weights()
    assert w[0] > w[3] and w[1] > w[5]
    real_counts = np.zeros(8)
    for epoch in range(12):
        ds.set_epoch(epoch)
        idx = ds.ordered_indices()
        assert len(idx) == 8
        real = ds._index_map[idx]
        real_counts += np.bincount(real, minlength=8)
    assert real_counts[:2].sum() > real_counts[2:].sum()  # oversampled

    # two virtual slots hitting the same real item must differ in mask
    ds.set_epoch(3)
    for target in range(8):
        vs = np.where(ds._index_map == target)[0]
        if len(vs) >= 2:
            m1 = ds[int(vs[0])]["time_mel_mask"]
            m2 = ds[int(vs[1])]["time_mel_mask"]
            assert not np.array_equal(m1, m2), "repeat draws share a mask"
            break
    else:
        pytest.skip("no repeated draw at this seed")

    # flag off -> plain permutation, every item exactly once
    hp["use_weighted_sampler"] = False
    ds2 = EditingDataset("train", hp, shuffle=True)
    ds2.set_epoch(0)
    assert ds2._index_map is None
    assert sorted(ds2.ordered_indices().tolist()) == list(range(8))


def test_mp_loader_matches_thread_loader(corpus):
    """num_workers>0: shared-memory worker batches == in-process batches."""
    data_dir, items, hp = corpus
    ds1 = EditingDataset("train", hp, shuffle=True)
    ds2 = EditingDataset("train", hp, shuffle=True)
    kw = dict(max_tokens=2000, max_sentences=4)
    ref_batches = list(DataLoader(ds1, num_workers=0, **kw))
    mp_batches = list(DataLoader(ds2, num_workers=2, **kw))
    assert len(ref_batches) == len(mp_batches) > 1
    for a, b in zip(ref_batches, mp_batches):
        assert set(a.keys()) == set(b.keys())
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                assert a[k] == b[k], k


def test_mp_loader_worker_error_surfaces(corpus):
    from speech_editing_tpu.data.loader_mp import iter_batches_mp

    data_dir, items, hp = corpus
    ds = EditingDataset("train", hp, shuffle=False)
    with pytest.raises(RuntimeError, match="data worker failed"):
        list(iter_batches_mp(ds, [[0, 999999]], epoch=0, num_workers=1))


def test_loader_producer_error_propagates(corpus):
    """A failing item must abort the epoch loudly, not truncate it silently."""
    import threading

    data_dir, items, hp = corpus
    ds = EditingDataset("train", hp, shuffle=False)
    orig_get = type(ds).__getitem__

    class Boom(EditingDataset):
        def __getitem__(self, index):
            if index == 3:
                raise ValueError("corrupt record")
            return orig_get(self, index)

    bad = Boom("train", hp, shuffle=False)
    loader = DataLoader(bad, max_sentences=2)
    n_before = threading.active_count()
    with pytest.raises(RuntimeError, match="DataLoader worker failed"):
        for _ in loader:
            pass
    # the producer thread must be retired, not leaked
    for _ in range(50):
        if threading.active_count() <= n_before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_loader_early_abandon_joins_producer(corpus):
    """Breaking out of a loader (sanity-val / test first-batch peek) must not
    leave the producer thread blocked on a full queue."""
    import threading

    data_dir, items, hp = corpus
    ds = EditingDataset("train", hp, shuffle=False)
    n_before = threading.active_count()
    for _ in range(5):  # repeated abandons must not accumulate threads
        loader = DataLoader(ds, max_sentences=1, prefetch=1)
        for _b in loader:
            break  # abandon mid-epoch with a full prefetch queue
        del loader
    for _ in range(100):
        if threading.active_count() <= n_before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_concat_weighted_sampler_consistency(tmp_path, rng):
    """ConcatDataset owns the weighted-sampler map: batching sizes must
    describe the items actually returned, and children keep no maps."""
    import os

    from speech_editing_tpu.data.datasets import ConcatDataset
    from speech_editing_tpu.data.indexed_dataset import IndexedDatasetBuilder
    from tests.helpers import synth_corpus_items

    dirs = []
    for d in ("a", "b"):
        data_dir = str(tmp_path / d)
        os.makedirs(data_dir)
        items = synth_corpus_items(rng, n_items=5)
        for i, it in enumerate(items):
            t = len(it["mel"])
            mask = np.zeros(t, np.int64)
            if i < 2:
                mask[: t // 2] = 1
            it["stutter_mel_mask"] = mask
        b = IndexedDatasetBuilder(f"{data_dir}/train")
        for it in items:
            b.add_item(it)
        b.finalize()
        np.save(f"{data_dir}/train_lengths.npy",
                np.asarray([len(it["mel"]) for it in items]))
        dirs.append(data_dir)

    hp = dict(TINY_HP)
    hp.update(infer=False, seed=7, mask_type="random",
              training_mask_ratio=0.5, max_frames=200, max_input_tokens=50,
              test_ids=[], min_frames=0, use_weighted_sampler=True)
    children = []
    for d in dirs:
        chp = dict(hp, binary_data_dir=d)
        children.append(EditingDataset("train", chp, shuffle=True))
    cat = ConcatDataset(children)
    cat.set_epoch(0)

    assert cat._index_map is not None  # concat owns the map
    for ch in children:
        assert ch._index_map is None  # children must not double-remap

    # size(i) must describe the item __getitem__ actually returns
    for i in range(len(cat)):
        item = cat[i]
        assert item["mel"].shape[0] == min(cat.size(i), 200)

    # repeated draws of the same real item get different random masks
    real = np.asarray(cat._index_map)
    vals, counts = np.unique(real, return_counts=True)
    rep = vals[counts > 1]
    if len(rep):
        vs = np.where(real == rep[0])[0][:2]
        m0 = cat[int(vs[0])]["time_mel_mask"]
        m1 = cat[int(vs[1])]["time_mel_mask"]
        if m0.shape == m1.shape:
            assert not np.array_equal(m0, m1)
