"""Copy-synthesis: wav -> mel -> vocoder -> wav (BASELINE config #1).

Exercises the mel frontend and the vocoder end to end on one utterance.
With ``--vocoder_ckpt`` pointing at a trained flax HiFi-GAN run directory
(or a torch HiFi-GAN checkpoint converted via
``utils/convert_torch_ckpt.py``) it vocodes neurally; otherwise it falls
back to Griffin-Lim so the loop works on a fresh setup.

Usage: python scripts/copy_synthesis.py <in.wav> <out.wav>
           [--vocoder_ckpt DIR] [--sample_rate 22050]
Prints one JSON line with timing + a mel-consistency L1 (mel of the
output vs mel of the input — low means the vocoder preserves content).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_wav")
    ap.add_argument("out_wav")
    ap.add_argument("--vocoder_ckpt", default="")
    ap.add_argument("--sample_rate", type=int, default=22050)
    ap.add_argument("--vocoder", default="hifigan")
    args = ap.parse_args()

    from speech_editing_tpu.infer.vocoder import get_vocoder_cls
    from speech_editing_tpu.utils.audio.dsp import wav2spec
    from speech_editing_tpu.utils.audio.io import save_wav

    hp = {"vocoder_ckpt": args.vocoder_ckpt,
          "audio_sample_rate": args.sample_rate, "fft_size": 1024,
          "hop_size": 256, "win_size": 1024, "audio_num_mel_bins": 80,
          "fmin": 55, "fmax": 7600}
    res = wav2spec(args.in_wav, fft_size=hp["fft_size"],
                   hop_size=hp["hop_size"], win_length=hp["win_size"],
                   num_mels=hp["audio_num_mel_bins"], fmin=hp["fmin"],
                   fmax=hp["fmax"], sample_rate=args.sample_rate)
    mel = res["mel"]
    vocoder = get_vocoder_cls(args.vocoder)(hp)
    vocoder.spec2wav(mel)  # warmup: exclude jit compile from the timing
    t0 = time.perf_counter()
    wav_out = vocoder.spec2wav(mel)
    dt = time.perf_counter() - t0
    save_wav(np.asarray(wav_out, np.float32), args.out_wav, args.sample_rate)

    mel_round = wav2spec(np.asarray(wav_out, np.float32),
                         fft_size=hp["fft_size"], hop_size=hp["hop_size"],
                         win_length=hp["win_size"],
                         num_mels=hp["audio_num_mel_bins"], fmin=hp["fmin"],
                         fmax=hp["fmax"], sample_rate=args.sample_rate)["mel"]
    t = min(len(mel), len(mel_round))
    mel_l1 = float(np.abs(mel[:t] - mel_round[:t]).mean())
    dur = len(res["wav"]) / args.sample_rate
    print(json.dumps({"out": args.out_wav, "frames": int(len(mel)),
                      "vocode_s": round(dt, 3),
                      "rtf": round(dt / max(dur, 1e-9), 5),
                      "mel_consistency_l1": round(mel_l1, 4)}))


if __name__ == "__main__":
    main()
