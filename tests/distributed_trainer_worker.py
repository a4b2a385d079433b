"""Worker for the multi-process PRODUCT-Trainer test (not a pytest module).

Unlike ``distributed_worker.py`` (which builds its own loop), this drives
the real ``Trainer.fit`` end-to-end under ``jax.distributed``: loader,
sanity validation, per-interval validation, checkpointing — the multi-host
path the reference covers with mp.spawn + NCCL + rank-0 checkpointing
(``utils/commons/trainer.py:116-137,431-449,474-495``).

argv: pid nproc port data_dir work_dir devices_per_process [task]
``task`` is ``sd`` (SpecDenoiserTask, default) or ``gan`` (HifiGanTask —
the multi-optimizer GAN path the reference runs under DDP,
``utils/commons/trainer.py:312``). nproc == 1 runs the single-process
baseline (no jax.distributed) on ``devices_per_process`` virtual devices
so the parent can compare final checkpoints bit-for-bit-close.
"""

import os
import sys

if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + sys.argv[6])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def make_hp(data_dir: str, work_dir: str) -> dict:
    from tests.helpers import TINY_HP, VOCAB

    hp = dict(TINY_HP)
    hp.update(
        binary_data_dir=data_dir, work_dir=work_dir, exp_name="dist",
        vocab_size=VOCAB, infer=False, seed=1234, sort_by_len=True,
        mask_type="alignment_aware", training_mask_ratio=0.8,
        max_frames=200, max_input_tokens=50, test_ids=[], min_frames=0,
        frame_size_multiple=32, token_size_multiple=8,
        max_updates=10, val_check_interval=5, tb_log_interval=5,
        num_sanity_val_steps=1, num_ckpt_keep=3, eval_max_batches=1,
        max_sentences=4, max_valid_sentences=2, max_tokens=2000,
        audio_sample_rate=22050, save_best=False)
    return hp


def make_gan_hp(data_dir: str, work_dir: str) -> dict:
    from tests.helpers import TINY_VOC_HP

    hp = dict(TINY_VOC_HP)
    hp.update(
        binary_data_dir=data_dir, work_dir=work_dir, exp_name="dist_gan",
        infer=False, max_updates=6, val_check_interval=3, tb_log_interval=3,
        num_sanity_val_steps=1, num_ckpt_keep=2, eval_max_batches=1,
        max_sentences=4, max_valid_sentences=2, max_tokens=None,
        endless_ds=True, vocoder="GriffinLim", save_best=False,
        # shrink the disc stacks: this test proves cross-process gradient
        # sync of the multi-optimizer GAN path, not disc capacity — the
        # full MPD+MSD compile blows the 1-CPU time budget (CLAUDE.md)
        disc_periods=[2, 3], msd_scales=1)
    return hp


def main(pid: int, nproc: int, port: str, data_dir: str, work_dir: str,
         task_name: str = "sd"):
    if nproc > 1:
        from speech_editing_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", nproc, pid)
    import jax

    from speech_editing_tpu.training.trainer import Trainer

    assert jax.process_count() == nproc, jax.process_count()
    if task_name == "gan":
        from speech_editing_tpu.training.tasks.hifigan import HifiGanTask

        hp = make_gan_hp(data_dir, work_dir)
        task = HifiGanTask(hp)
    else:
        from speech_editing_tpu.training.tasks.spec_denoiser import \
            SpecDenoiserTask

        hp = make_hp(data_dir, work_dir)
        task = SpecDenoiserTask(hp)
    trainer = Trainer(task, hp)
    trainer.fit()
    print(f"DONE pid={pid} step={trainer.global_step}", flush=True)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    # warm compile cache shared with the in-process suite
    from speech_editing_tpu.utils.os_utils import cpu_keyed_cache_dir

    jax.config.update("jax_compilation_cache_dir", cpu_keyed_cache_dir(
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
         sys.argv[5], sys.argv[7] if len(sys.argv) > 7 else "sd")
