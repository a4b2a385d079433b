"""Vocoder GAN training: dataset crops, fused GAN step, trainer integration."""

import os

import numpy as np
import pytest

from speech_editing_tpu.data.vocoder_dataset import VocoderDataset
from speech_editing_tpu.training.tasks.hifigan import HifiGanTask
from speech_editing_tpu.training.trainer import Trainer

from tests.helpers import TINY_VOC_HP, write_voc_corpus as _write_voc_corpus


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
