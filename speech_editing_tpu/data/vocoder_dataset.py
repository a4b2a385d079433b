"""Vocoder dataset: fixed-length random wav/mel crops.

Parity surface: ``tasks/vocoder/dataset_utils.py`` (VocoderDataset :44-130):
items shorter than the crop are skipped, training crops are
``max_samples // hop_size`` frames picked at a random frame offset (wav crop
= frame crop * hop); test "crops" to ``len(c) - 1`` frames from offset 0 —
the reference's exact infer behavior (:91, batch_max_frames==0 branch),
kept for parity. The reference's EndlessDistributedSampler is subsumed by
the endless DataLoader + mesh batch sharding. ``mel_lengths`` is emitted so
padded multi-item test batches truncate per item instead of writing
zero-padding tails.

TPU-first: every training batch has the SAME static shape (crop length), so
the GAN train step compiles exactly once.
"""

from __future__ import annotations

import numpy as np

from speech_editing_tpu.data.collate import collate_1d, collate_2d
from speech_editing_tpu.data.datasets import BaseDataset
from speech_editing_tpu.data.indexed_dataset import IndexedDataset


class VocoderDataset(BaseDataset):
    def __init__(self, prefix: str, hp, shuffle: bool = False):
        super().__init__(hp, shuffle)
        self.prefix = prefix
        self.data_dir = hp["binary_data_dir"]
        self.is_infer = prefix == "test"
        self.hop_size = hp["hop_size"]
        self.batch_max_frames = 0 if self.is_infer else \
            hp["max_samples"] // self.hop_size
        self.indexed_ds = None
        sizes = np.load(f"{self.data_dir}/{self.prefix}_lengths.npy")
        self.avail_idxs = [i for i, s in enumerate(sizes)
                           if s > self.batch_max_frames]
        if len(self.avail_idxs) < len(sizes):
            print(f"| {len(sizes) - len(self.avail_idxs)} short items "
                  f"skipped in {prefix} set.")
        self.sizes = [sizes[i] for i in self.avail_idxs]

    def __getitem__(self, index: int) -> dict:
        real_idx = self.avail_idxs[index]
        if self.indexed_ds is None:
            self.indexed_ds = IndexedDataset(f"{self.data_dir}/{self.prefix}")
        item = self.indexed_ds[real_idx]
        return {
            "id": real_idx,
            "item_name": item["item_name"],
            "mel": np.asarray(item["mel"], np.float32),
            "wav": np.asarray(item["wav"], np.float32),
            "pitch": np.asarray(item.get("pitch", np.zeros(len(item["mel"]))), np.int64),
            "f0": np.asarray(item.get("f0", np.zeros(len(item["mel"]))), np.float32),
            "_rng": self._item_rng(index),
        }

    def collater(self, batch: list) -> dict:
        if len(batch) == 0:
            return {}
        ys, cs, ps, f0s, names = [], [], [], [], []
        for s in batch:
            x, c, p, f0 = s["wav"], s["mel"], s["pitch"], s["f0"]
            # binarized wavs are padded to an exact frame boundary
            x = x[: len(c) * self.hop_size]
            if len(x) < len(c) * self.hop_size:
                x = np.pad(x, (0, len(c) * self.hop_size - len(x)))
            max_frames = self.batch_max_frames or (len(c) - 1)
            if len(c) > max_frames:
                start = int(s["_rng"].randint(0, len(c) - max_frames))
                c = c[start: start + max_frames]
                p = p[start: start + max_frames]
                f0 = f0[start: start + max_frames]
                x = x[start * self.hop_size:
                      (start + max_frames) * self.hop_size]
            else:
                continue
            names.append(s["item_name"])
            ys.append(x)
            cs.append(c)
            ps.append(p)
            f0s.append(f0)
        return {
            "wavs": collate_1d(ys, 0.0),        # [B, N]
            "mels": collate_2d(cs, 0.0),        # [B, T', 80]
            "pitches": collate_1d(ps, 0),
            "f0": collate_1d(f0s, 0.0),
            "mel_lengths": np.asarray([len(c) for c in cs], np.int64),
            "item_name": names,
            "nsamples": len(names),
        }
