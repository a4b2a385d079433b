"""Every public module imports cleanly (catches broken imports early)."""

import importlib

import pytest

MODULES = [
    "speech_editing_tpu.config.hparams",
    "speech_editing_tpu.data",
    "speech_editing_tpu.data.preprocess",
    "speech_editing_tpu.data.binarizer",
    "speech_editing_tpu.data.vocoder_dataset",
    "speech_editing_tpu.data.wav_processors",
    "speech_editing_tpu.evals.get_metrics",
    "speech_editing_tpu.evals.attention_metrics",
    "speech_editing_tpu.infer.spec_denoiser",
    "speech_editing_tpu.infer.editors",
    "speech_editing_tpu.infer.vocoder",
    "speech_editing_tpu.models.a3t",
    "speech_editing_tpu.models.campnet",
    "speech_editing_tpu.models.diffspeech",
    "speech_editing_tpu.models.editspeech",
    "speech_editing_tpu.models.fs",
    "speech_editing_tpu.models.fs2_orig",
    "speech_editing_tpu.models.portaspeech",
    "speech_editing_tpu.models.stutter_speech",
    "speech_editing_tpu.models.vocoder",
    "speech_editing_tpu.modules.conformer",
    "speech_editing_tpu.modules.flows",
    "speech_editing_tpu.modules.lstm",
    "speech_editing_tpu.modules.multi_window_disc",
    "speech_editing_tpu.modules.rel_transformer",
    "speech_editing_tpu.modules.rnn",
    "speech_editing_tpu.ops.pallas.mel_kernel",
    "speech_editing_tpu.parallel.mesh",
    "speech_editing_tpu.training.trainer",
    "speech_editing_tpu.training.tasks.spec_denoiser",
    "speech_editing_tpu.training.tasks.campnet",
    "speech_editing_tpu.training.tasks.a3t",
    "speech_editing_tpu.training.tasks.editspeech",
    "speech_editing_tpu.training.tasks.stutter_speech",
    "speech_editing_tpu.training.tasks.tts",
    "speech_editing_tpu.training.tasks.portaspeech",
    "speech_editing_tpu.training.tasks.ps_adv",
    "speech_editing_tpu.training.tasks.hifigan",
    "speech_editing_tpu.utils.meters",
    "speech_editing_tpu.utils.multiprocess",
    "speech_editing_tpu.utils.nn_utils",
    "speech_editing_tpu.utils.plot",
    "speech_editing_tpu.utils.audio.cwt",
    "speech_editing_tpu.utils.text.processors",
]


@pytest.mark.parametrize("mod", MODULES)
def test_import(mod):
    importlib.import_module(mod)


def test_all_egs_configs_resolve():
    import glob

    from speech_editing_tpu.config.hparams import load_config
    from speech_editing_tpu.training.tasks.base import import_task_cls

    for fn in glob.glob("egs/*.yaml"):
        cfg = load_config(fn)
        if "task_cls" in cfg:
            import_task_cls(cfg["task_cls"])  # resolvable class path
