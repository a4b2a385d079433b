"""Task registry: classes referenced by egs/*.yaml ``task_cls`` strings."""

from speech_editing_tpu.training.tasks.a3t import A3TTask
from speech_editing_tpu.training.tasks.base import BaseTask, import_task_cls
from speech_editing_tpu.training.tasks.campnet import CampNetTask
from speech_editing_tpu.training.tasks.editspeech import EditSpeechTask
from speech_editing_tpu.training.tasks.hifigan import HifiGanTask
from speech_editing_tpu.training.tasks.portaspeech import (PortaSpeechFlowTask,
                                                           PortaSpeechTask)
from speech_editing_tpu.training.tasks.ps_adv import PortaSpeechAdvTask
from speech_editing_tpu.training.tasks.spec_denoiser import SpecDenoiserTask
from speech_editing_tpu.training.tasks.stutter_speech import (
    StutterPredictorTask, StutterSpeechTask)
from speech_editing_tpu.training.tasks.tts import (DiffSpeechTask,
                                                   FastSpeech2OrigTask,
                                                   FastSpeechTask)

__all__ = [
    "A3TTask", "BaseTask", "import_task_cls", "CampNetTask",
    "EditSpeechTask", "HifiGanTask", "PortaSpeechFlowTask", "PortaSpeechTask",
    "PortaSpeechAdvTask", "SpecDenoiserTask", "StutterPredictorTask",
    "StutterSpeechTask", "DiffSpeechTask", "FastSpeech2OrigTask",
    "FastSpeechTask",
]
