"""Vocoder GAN training: dataset crops, fused GAN step, trainer integration."""

import os

import numpy as np
import pytest

from speech_editing_tpu.data.indexed_dataset import IndexedDatasetBuilder
from speech_editing_tpu.data.vocoder_dataset import VocoderDataset
from speech_editing_tpu.training.tasks.hifigan import HifiGanTask
from speech_editing_tpu.training.trainer import Trainer

TINY_VOC_HP = {
    "audio_sample_rate": 22050, "audio_num_mel_bins": 80, "hop_size": 64,
    "fft_size": 256, "win_size": 256, "fmin": 55, "fmax": 7600,
    "resblock": "2", "upsample_rates": [4, 4, 4],
    "upsample_kernel_sizes": [8, 8, 8], "upsample_initial_channel": 16,
    "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
    "lr": 2e-4, "adam_b1": 0.8, "adam_b2": 0.99, "lr_decay": 0.999,
    "scheduler_step_size": 600, "lambda_mel": 45.0, "lambda_adv": 1.0,
    "use_fm_loss": True, "use_ms_stft": True, "max_samples": 2048,
    "seed": 1, "sort_by_len": True, "vocab_size": 10,
}


def _write_voc_corpus(data_dir, rng, n_items=6, hop=64):
    os.makedirs(data_dir, exist_ok=True)
    for prefix in ("train", "valid", "test"):
        b = IndexedDatasetBuilder(f"{data_dir}/{prefix}")
        lens = []
        for i in range(n_items):
            t = int(rng.randint(48, 96))
            mel = (rng.randn(t, 80) * 0.5 - 2).astype(np.float32)
            wav = (rng.randn(t * hop) * 0.1).astype(np.float32)
            b.add_item({"item_name": f"v{i}", "mel": mel, "wav": wav,
                        "pitch": np.zeros(t, np.int64),
                        "f0": np.zeros(t, np.float32)})
            lens.append(t)
        b.finalize()
        np.save(f"{data_dir}/{prefix}_lengths.npy", np.asarray(lens))


def test_vocoder_dataset_static_crops(tmp_path, rng):
    data_dir = str(tmp_path / "voc")
    _write_voc_corpus(data_dir, rng)
    hp = dict(TINY_VOC_HP, binary_data_dir=data_dir)
    ds = VocoderDataset("train", hp, shuffle=True)
    crop = hp["max_samples"] // hp["hop_size"]
    batch = ds.collater([ds[i] for i in range(min(4, len(ds)))])
    assert batch["mels"].shape[1] == crop
    assert batch["wavs"].shape[1] == crop * hp["hop_size"]


def test_gan_trainer_end_to_end(tmp_path, rng):
    data_dir = str(tmp_path / "voc")
    work_dir = str(tmp_path / "work")
    _write_voc_corpus(data_dir, rng)
    hp = dict(TINY_VOC_HP, binary_data_dir=data_dir, work_dir=work_dir,
              exp_name="voc", max_updates=3, val_check_interval=2,
              tb_log_interval=1, num_sanity_val_steps=1, num_ckpt_keep=2,
              eval_max_batches=1, max_sentences=2, max_valid_sentences=2,
              max_tokens=None, test_num=1, endless_ds=True,
              vocoder="GriffinLim", save_gt=True)
    task = HifiGanTask(hp)
    trainer = Trainer(task, hp)
    trainer.fit()
    from speech_editing_tpu.training.checkpoint import get_last_checkpoint

    path, steps = get_last_checkpoint(work_dir)
    assert steps == 3

    # copy-synthesis test loop with the trained generator
    trainer2 = Trainer(HifiGanTask(hp), hp)
    gen_dir = trainer2.test()
    wavs = os.listdir(os.path.join(gen_dir, "wavs"))
    assert any(w.startswith("[P]") and w.endswith(".wav") for w in wavs)
