"""Speech datasets + host-side loader feeding the TPU train loop.

Parity surface:

* ``BaseSpeechDataset`` / ``StutterSpeechDataset`` (here: EditingDataset) —
  ``tasks/speech_editing/dataset_utils.py:14-170``: mel/ph_token/mel2ph/f0/uv
  per item, time_mel_mask generation (train = random | alignment_aware at
  ``training_mask_ratio``; infer = contiguous 50% phone span), spk embed/id;
* ``BaseDataset`` size-sorted shuffled ordering —
  ``utils/commons/dataset_utils.py:173-211``;
* the loader replaces torch DataLoader + rank-strided batch sharding
  (``tasks/tts/speech_base.py:91-137``): batches are token-bucketed
  (collate pads to ``size_multiple`` so XLA sees few distinct shapes) and
  the whole global batch is device_put sharded over the mesh by the trainer.

Randomness is explicit: per-item masks draw from a RandomState seeded by
(seed, epoch, index), so any item is reproducible independent of worker
scheduling.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Any, Optional

import numpy as np

from speech_editing_tpu.data.collate import (batch_by_size, collate_1d_or_2d)
from speech_editing_tpu.data.indexed_dataset import IndexedDataset
from speech_editing_tpu.data.masks import (generate_alignment_aware_time_mask,
                                           generate_inference_mask,
                                           generate_time_mask)
from speech_editing_tpu.utils.audio.pitch import norm_interp_f0


class BaseDataset:
    def __init__(self, hp, shuffle: bool = False):
        self.hp = hp
        self.shuffle = shuffle
        self.sort_by_len = hp.get("sort_by_len", True)
        self.sizes: Any = None
        self.epoch = 0
        self._index_map: Any = None  # weighted-sampler virtual -> real

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self._index_map = None
        if self.shuffle and self.hp.get("use_weighted_sampler", False):
            w = self.sample_weights()
            if w is not None:
                # weighted resampling with replacement (reference
                # stutter_predictor.py:213-225 WeightedRandomSampler role).
                # The draw lives HERE (not in ordered_indices) so every
                # process rebuilds the same map from (seed, epoch), and
                # __getitem__ keys its mask rng on the VIRTUAL index —
                # repeated draws of one item get independent random masks.
                p = np.asarray(w, np.float64)
                p = p / p.sum()
                rng = np.random.RandomState(
                    int(self.hp.get("seed", 1234)) + epoch)
                self._index_map = rng.choice(len(p), len(p), replace=True,
                                             p=p)

    def _real_index(self, index: int) -> int:
        return int(self._index_map[index]) if self._index_map is not None \
            else index

    _rng_salt = 0  # ConcatDataset threads the virtual index through here

    def _item_rng(self, index: int) -> np.random.RandomState:
        seed = int(self.hp.get("seed", 1234))
        return np.random.RandomState(
            (seed * 1000003 + self.epoch * 10007 + index
             + self._rng_salt * 97003) % (2 ** 31))

    def __len__(self):
        return len(self.sizes)

    def num_tokens(self, index: int) -> int:
        return self.size(index)

    def size(self, index: int) -> int:
        return min(self.sizes[self._real_index(index)],
                   self.hp.get("max_frames", 1548))

    def sample_weights(self):
        """Optional per-item sampling weights (None = uniform)."""
        return None

    def ordered_indices(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(
                int(self.hp.get("seed", 1234)) + self.epoch)
            indices = rng.permutation(len(self))
            if self.sort_by_len:
                real_sizes = np.array(self.sizes)
                if self._index_map is not None:  # virtual -> real sizes
                    real_sizes = real_sizes[self._index_map]
                indices = indices[np.argsort(real_sizes[indices],
                                             kind="mergesort")]
        else:
            indices = np.arange(len(self))
        return indices


class BaseSpeechDataset(BaseDataset):
    def __init__(self, prefix: str, hp, shuffle: bool = False,
                 items=None, data_dir: Optional[str] = None):
        super().__init__(hp, shuffle)
        self.data_dir = hp["binary_data_dir"] if data_dir is None else data_dir
        self.prefix = prefix
        self.indexed_ds = None
        if items is not None:
            self.indexed_ds = items
            self.sizes = [len(it["mel"]) for it in items]
            self.avail_idxs = list(range(len(self.sizes)))
        else:
            self.sizes = np.load(f"{self.data_dir}/{self.prefix}_lengths.npy")
            if prefix == "test" and len(hp.get("test_ids", [])) > 0:
                self.avail_idxs = list(hp["test_ids"])
            else:
                self.avail_idxs = list(range(len(self.sizes)))
            if prefix == "train" and hp.get("min_frames", 0) > 0:
                self.avail_idxs = [x for x in self.avail_idxs
                                   if self.sizes[x] >= hp["min_frames"]]
            self.sizes = [self.sizes[i] for i in self.avail_idxs]

    def _get_item(self, index: int):
        index = self._real_index(index)  # weighted-sampler virtual -> real
        if self.avail_idxs is not None:
            index = self.avail_idxs[index]
        if self.indexed_ds is None:
            self.indexed_ds = IndexedDataset(f"{self.data_dir}/{self.prefix}")
        return self.indexed_ds[index]

    def __getitem__(self, index: int) -> dict:
        hp = self.hp
        item = self._get_item(index)
        max_frames = hp.get("max_frames", 1548)
        spec = np.asarray(item["mel"], np.float32)[:max_frames]
        fm = hp.get("frames_multiple", 1)
        max_frames = spec.shape[0] // fm * fm
        spec = spec[:max_frames]
        ph_token = np.asarray(
            item["ph_token"][: hp.get("max_input_tokens", 1550)], np.int64)
        sample = {
            "id": index,
            "item_name": item["item_name"],
            "text": item.get("txt", ""),
            "txt_token": ph_token,
            "mel": spec,
        }
        if hp.get("use_spk_embed"):
            sample["spk_embed"] = np.asarray(item["spk_embed"], np.float32)
        if hp.get("use_spk_id"):
            sample["spk_id"] = int(item["spk_id"])
        return sample

    def collater(self, samples: list) -> dict:
        if len(samples) == 0:
            return {}
        hp = self.hp
        sm = int(hp.get("frame_size_multiple", 1))
        tok_m = int(hp.get("token_size_multiple", 1))
        batch = {
            "id": np.asarray([s["id"] for s in samples], np.int64),
            "item_name": [s["item_name"] for s in samples],
            "nsamples": len(samples),
            "text": [s["text"] for s in samples],
            "txt_tokens": collate_1d_or_2d(
                [s["txt_token"] for s in samples], 0, size_multiple=tok_m),
            "txt_lengths": np.asarray(
                [len(s["txt_token"]) for s in samples], np.int64),
            "mels": collate_1d_or_2d(
                [s["mel"] for s in samples], 0.0, size_multiple=sm),
            "mel_lengths": np.asarray(
                [s["mel"].shape[0] for s in samples], np.int64),
        }
        if hp.get("use_spk_embed"):
            batch["spk_embed"] = np.stack([s["spk_embed"] for s in samples])
        if hp.get("use_spk_id"):
            batch["spk_ids"] = np.asarray(
                [s["spk_id"] for s in samples], np.int64)
        return batch


class EditingDataset(BaseSpeechDataset):
    """Speech-editing dataset with time_mel_masks (reference
    StutterSpeechDataset)."""

    _sample_weights: Any = None

    def sample_weights(self):
        """Oversample items containing stutter frames (reference
        stutter_predictor.py:216-222 formula: (10 + stutter)/(total))."""
        if self._sample_weights is None:
            ws = []
            for i in range(len(self)):
                item = self._get_item(i)
                m = np.asarray(item.get("stutter_mel_mask", []))
                if m.size == 0:
                    ws.append(1.0)
                else:
                    ws.append((10.0 + float((m > 0).sum())) / m.size)
            self._sample_weights = np.asarray(ws, np.float64)
        return self._sample_weights

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        hp = self.hp
        item = self._get_item(index)
        sample["wav_fn"] = item.get("wav_fn")
        t = sample["mel"].shape[0]
        mel2ph = np.asarray(item["mel2ph"], np.int64)[:t]
        sample["mel2ph"] = mel2ph

        if hp.get("use_pitch_embed", True):
            f0, uv = norm_interp_f0(np.asarray(item["f0"], np.float32)[:t])
            sample["f0"] = f0.astype(np.float32)
            sample["uv"] = uv.astype(np.float32)
            sample["pitch"] = np.asarray(
                item.get("pitch", np.zeros(t)), np.int64)[:t]
            if hp.get("pitch_type") == "cwt":
                # CWT pitch targets (reference FastSpeechDataset,
                # tasks/tts/fs2_orig.py:18-29). Prefer binarized fields
                # (with_f0cwt); else decompose on the fly from raw f0.
                if "cwt_spec" in item:
                    cwt_spec = np.asarray(item["cwt_spec"], np.float32)
                    mean = float(item.get("f0_mean", item.get("cwt_mean")))
                    std = float(item.get("f0_std", item.get("cwt_std")))
                else:
                    from speech_editing_tpu.utils.audio.cwt import f0_to_cwt
                    d = f0_to_cwt(np.asarray(item["f0"], np.float32)[:t])
                    cwt_spec = d["cwt_spec"]
                    mean, std = d["cwt_mean"], d["cwt_std"]
                sample["cwt_spec"] = cwt_spec[:t]
                sample["f0_mean"] = mean
                sample["f0_std"] = std

        if "stutter_mel_mask" in item:
            sample["stutter_mel_mask"] = np.asarray(
                item["stutter_mel_mask"], np.int64)[:t]

        rng = self._item_rng(index)
        if not hp.get("infer", False):
            ratio = hp.get("training_mask_ratio", 0.8)
            if hp.get("mask_type", "alignment_aware") == "random":
                mask = generate_time_mask(t, ratio, rng)
            else:
                mask = generate_alignment_aware_time_mask(mel2ph, ratio, rng)
        else:
            mask = generate_inference_mask(mel2ph, 0.5, rng)
        sample["time_mel_mask"] = mask.astype(np.float32)
        return sample

    def collater(self, samples: list) -> dict:
        if len(samples) == 0:
            return {}
        batch = super().collater(samples)
        hp = self.hp
        sm = int(hp.get("frame_size_multiple", 1))
        batch["wav_fn"] = [s["wav_fn"] for s in samples]
        if hp.get("use_pitch_embed", True):
            batch["f0"] = collate_1d_or_2d(
                [s["f0"] for s in samples], 0.0, size_multiple=sm)
            batch["uv"] = collate_1d_or_2d(
                [s["uv"] for s in samples], 0.0, size_multiple=sm)
            batch["pitch"] = collate_1d_or_2d(
                [s["pitch"] for s in samples], 0, size_multiple=sm)
            if "cwt_spec" in samples[0]:
                batch["cwt_spec"] = collate_1d_or_2d(
                    [s["cwt_spec"] for s in samples], 0.0, size_multiple=sm)
                batch["f0_mean"] = np.asarray(
                    [s["f0_mean"] for s in samples], np.float32)
                batch["f0_std"] = np.asarray(
                    [s["f0_std"] for s in samples], np.float32)
        batch["mel2ph"] = collate_1d_or_2d(
            [s["mel2ph"] for s in samples], 0, size_multiple=sm)
        if "stutter_mel_mask" in samples[0]:
            batch["stutter_mel_masks"] = collate_1d_or_2d(
                [s["stutter_mel_mask"] for s in samples],
                hp.get("stutter_pad_idx", -1), size_multiple=sm)
        batch["time_mel_masks"] = collate_1d_or_2d(
            [s["time_mel_mask"] for s in samples], 0, size_multiple=sm)
        return batch


class ConcatDataset(BaseDataset):
    """Concatenation of datasets sharing a collater (reference
    BaseConcatDataset, dataset_utils.py:218-246) — backs the multi-corpus
    ``train_sets`` option."""

    def __init__(self, datasets: list):
        assert datasets
        super().__init__(datasets[0].hp, datasets[0].shuffle)
        self.datasets = datasets
        self.sizes = [s for d in datasets for s in d.sizes]
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def set_epoch(self, epoch: int):
        # weighted sampling is owned at the CONCAT level: children must not
        # build their own virtual->real maps, or the concat-level sizes used
        # for token-budget batching would describe the wrong items
        super().set_epoch(epoch)
        for d in self.datasets:
            d.set_epoch(epoch)
            d._index_map = None

    def sample_weights(self):
        ws = [d.sample_weights() for d in self.datasets]
        if all(w is None for w in ws):
            return None
        return np.concatenate([
            np.ones(len(d), np.float64) if w is None else np.asarray(w)
            for d, w in zip(self.datasets, ws)])

    def __getitem__(self, index: int) -> dict:
        real = self._real_index(index)
        ds_idx = int(np.searchsorted(self._offsets, real, side="right") - 1)
        d = self.datasets[ds_idx]
        # salt the child's per-item rng with the virtual index so repeated
        # weighted draws of one item get independent random masks (access is
        # sequential per loader thread/worker, so the attr swap is safe)
        d._rng_salt = index - real
        try:
            return d[real - self._offsets[ds_idx]]
        finally:
            d._rng_salt = 0

    def collater(self, samples: list) -> dict:
        return self.datasets[0].collater(samples)


class WordSpeechDataset(EditingDataset):
    """Adds word-level fields (reference FastSpeechWordDataset,
    tasks/tts/dataset_utils.py:149-184): word tokens, ph2word, mel2word."""

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        item = self._get_item(index)
        t = sample["mel"].shape[0]
        sample["word_token"] = np.asarray(item["word_token"], np.int64)
        sample["ph2word"] = np.asarray(
            item["ph2word"][: len(sample["txt_token"])], np.int64)
        if "mel2word" in item:
            sample["mel2word"] = np.asarray(item["mel2word"], np.int64)[:t]
        return sample

    def collater(self, samples: list) -> dict:
        batch = super().collater(samples)
        if not samples:
            return batch
        sm = int(self.hp.get("frame_size_multiple", 1))
        tok_m = int(self.hp.get("token_size_multiple", 1))
        batch["word_tokens"] = collate_1d_or_2d(
            [s["word_token"] for s in samples], 0, size_multiple=tok_m)
        batch["ph2word"] = collate_1d_or_2d(
            [s["ph2word"] for s in samples], 0, size_multiple=tok_m)
        if "mel2word" in samples[0]:
            batch["mel2word"] = collate_1d_or_2d(
                [s["mel2word"] for s in samples], 0, size_multiple=sm)
        return batch


class _ProducerFailure:
    """Exception carrier from the loader's producer thread to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Token-bucketed batch iterator with background prefetch.

    Replaces torch DataLoader workers (``ds_workers``): with
    ``num_workers=0`` one prefetch thread decodes ahead of the device;
    with ``num_workers>0`` batches are decoded + collated by forked worker
    processes and returned through shared memory (``data/loader_mp.py``) so
    input throughput scales with host cores instead of one GIL.
    """

    def __init__(self, dataset: BaseDataset, max_tokens: Optional[int] = None,
                 max_sentences: Optional[int] = None,
                 required_batch_size_multiple: int = 1,
                 endless: bool = False, prefetch: int = 2,
                 num_workers: int = 0):
        self.dataset = dataset
        self.max_tokens = max_tokens
        self.max_sentences = max_sentences
        self.bsz_mult = required_batch_size_multiple
        self.endless = endless
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._epoch = 0
        self._pool = None

    def close(self):
        """Shut down worker processes (no-op for the in-process path)."""
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.close()
            self._pool = None

    def __del__(self):
        self.close()

    def _batches(self):
        indices = self.dataset.ordered_indices()
        return batch_by_size(
            indices, self.dataset.num_tokens, max_tokens=self.max_tokens,
            max_sentences=self.max_sentences,
            required_batch_size_multiple=self.bsz_mult)

    def __iter__(self):
        while True:
            self.dataset.set_epoch(self._epoch)
            batches = self._batches()
            if self.dataset.shuffle:
                rng = np.random.RandomState(
                    int(self.dataset.hp.get("seed", 1234)) + self._epoch)
                rng.shuffle(batches)

            if self.num_workers > 0:
                if getattr(self, "_pool", None) is None:
                    from speech_editing_tpu.data.loader_mp import MPBatchPool

                    # persistent across epochs: fork once, stream tasks
                    self._pool = MPBatchPool(self.dataset, self.num_workers,
                                             prefetch=self.prefetch)
                yield from self._pool.iter_epoch(batches, self._epoch)
                self._epoch += 1
                if not self.endless:
                    self._pool.close()
                    self._pool = None
                    return
                continue

            q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
            stop = object()
            cancel = threading.Event()

            def guarded_put(item) -> bool:
                """Bounded put that gives up when the consumer is gone."""
                while not cancel.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        return True
                    except queue_mod.Full:
                        continue
                return False

            def producer():
                try:
                    for idxs in batches:
                        if cancel.is_set():
                            return
                        samples = [self.dataset[i] for i in idxs]
                        if not guarded_put(self.dataset.collater(samples)):
                            return
                except BaseException as e:  # surface in the consumer loudly
                    guarded_put(_ProducerFailure(e))
                finally:
                    guarded_put(stop)

            th = threading.Thread(target=producer, daemon=True)
            th.start()
            try:
                while True:
                    b = q.get()
                    if b is stop:
                        break
                    if isinstance(b, _ProducerFailure):
                        raise RuntimeError(
                            "DataLoader worker failed while producing a "
                            "batch") from b.exc
                    yield b
            finally:
                # early abandon (sanity-val break, test first-batch peek):
                # unblock and retire the producer instead of leaking it
                cancel.set()
                try:
                    while True:
                        q.get_nowait()
                except queue_mod.Empty:
                    pass
                th.join(timeout=5)
            self._epoch += 1
            if not self.endless:
                return
