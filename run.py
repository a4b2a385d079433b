"""CLI entry: config-driven training / inference.

Parity surface: reference ``tasks/run.py`` —
``python run.py --config egs/<x>.yaml --exp_name <x> [--infer/--reset/-hp k=v]``.
The YAML's ``task_cls`` selects the task class dynamically.

``SE_TPU_FORCE_CPU=1`` forces the CPU backend at jax-config level —
the TPU platform plugin overrides the ``JAX_PLATFORMS`` env var, so
this is the only reliable way to train/infer on a host without (or
with an unreachable) accelerator.
"""

import os

if os.environ.get("SE_TPU_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from speech_editing_tpu.config.hparams import set_hparams
from speech_editing_tpu.training.tasks.base import import_task_cls


def run():
    hp = set_hparams()
    assert hp.get("task_cls"), "config must define task_cls"
    task_cls = import_task_cls(hp["task_cls"])
    print(f"| Task: {task_cls.__name__}")
    task_cls.start(hp)


if __name__ == "__main__":
    run()
