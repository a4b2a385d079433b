"""Generate a synthetic demo wav for inference/example.csv.

The CSV region-edit driver (speech_editing_tpu/infer/spec_denoiser.py,
parity: reference inference/tts/spec_denoiser.py + inference/example.csv)
needs a source recording; real use points wav_fn_orig at actual speech.
This writes a harmonic stand-in so the documented default path exists and
the pipeline can be exercised without shipping audio assets.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speech_editing_tpu.utils.audio.io import save_wav  # noqa: E402


def main(out="inference/audio/demo_1.wav", sr=22050, seconds=2.0):
    t = np.arange(int(sr * seconds)) / sr
    f0 = 140.0 + 20.0 * np.sin(2 * np.pi * 0.7 * t)  # gentle vibrato
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = sum(0.3 / k * np.sin(k * phase) for k in (1, 2, 3))
    wav *= 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2  # syllable-ish AM
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_wav(wav.astype(np.float32), out, sr)
    print(f"| wrote {out} ({seconds}s @ {sr}Hz)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
