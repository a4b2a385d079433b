"""HifiGAN inference registry loads trained GAN checkpoints end-to-end."""

import os

import numpy as np
import yaml

from speech_editing_tpu.infer.vocoder import get_vocoder_cls
from speech_editing_tpu.training.tasks.hifigan import HifiGanTask
from speech_editing_tpu.training.trainer import Trainer
from tests.test_vocoder_training import TINY_VOC_HP, _write_voc_corpus


def test_hifigan_registry_loads_trained_ckpt(tmp_path, rng):
    data_dir = str(tmp_path / "voc")
    work_dir = str(tmp_path / "voc_ckpt")
    _write_voc_corpus(data_dir, rng)
    hp = dict(TINY_VOC_HP, binary_data_dir=data_dir, work_dir=work_dir,
              exp_name="v", max_updates=2, val_check_interval=10 ** 9,
              tb_log_interval=1, num_sanity_val_steps=0, num_ckpt_keep=1,
              eval_max_batches=1, max_sentences=2, max_valid_sentences=2,
              max_tokens=None, endless_ds=True, vocoder="HifiGAN",
              num_valid_plots=0)
    Trainer(HifiGanTask(hp), hp).fit()
    # the registry expects vocoder_ckpt dir with config.yaml + ckpt
    with open(os.path.join(work_dir, "config.yaml"), "w") as f:
        yaml.safe_dump({k: hp[k] for k in
                        ("upsample_rates", "upsample_kernel_sizes",
                         "upsample_initial_channel", "resblock",
                         "resblock_kernel_sizes",
                         "resblock_dilation_sizes")}, f)
    infer_hp = dict(hp, vocoder_ckpt=work_dir)
    voc = get_vocoder_cls("HifiGAN")(infer_hp)
    assert voc._apply is not None, "fell back to Griffin-Lim"
    mel = (rng.randn(40, 80) * 0.5 - 2).astype(np.float32)
    wav = voc.spec2wav(mel)
    up = int(np.prod(hp["upsample_rates"]))
    assert wav.shape == (40 * up,)
    assert np.isfinite(wav).all()
