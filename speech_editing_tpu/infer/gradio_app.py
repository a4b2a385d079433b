"""Gradio web demo for region editing (gated on the gradio package).

Parity surface: ``inference/tts/gradio/infer.py`` — a small web UI driving
the inference pipeline. Here the form takes source audio + original and
edited transcripts + a word region and runs the FluentSpeech region editor.
"""

from __future__ import annotations

import numpy as np


def build_app(hp):
    try:
        import gradio as gr  # type: ignore
    except ImportError as e:
        raise ImportError("the gradio demo needs `pip install gradio`") from e

    from speech_editing_tpu.infer.spec_denoiser import SpecDenoiserInfer
    from speech_editing_tpu.utils.audio.dsp import wav2spec

    infer_ins = SpecDenoiserInfer(hp)
    sr = int(hp["audio_sample_rate"])

    def edit(audio, text, edited_text, region, edited_region):
        in_sr, wav = audio
        wav = np.asarray(wav)
        if wav.dtype.kind == "i":  # gradio numpy audio arrives int16
            wav = wav.astype(np.float32) / 32768.0
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:  # stereo -> mono
            wav = wav.mean(axis=1)
        if int(in_sr) != sr:
            from scipy.signal import resample_poly

            g = np.gcd(int(in_sr), sr)
            wav = resample_poly(wav, sr // g, int(in_sr) // g).astype(
                np.float32)
        res = wav2spec(wav, sample_rate=sr, fft_size=hp["fft_size"],
                       hop_size=hp["hop_size"], win_length=hp["win_size"],
                       num_mels=hp["audio_num_mel_bins"],
                       fmin=hp["fmin"], fmax=hp["fmax"])
        inp = {"item_name": "gradio", "text": text,
               "edited_text": edited_text, "region": region,
               "edited_region": edited_region,
               "mel": res["mel"], "wav": res["wav"],
               "mfa_textgrid": hp.get("gradio_textgrid", "")}
        wav_out, *_ = infer_ins.infer_once(inp)
        return (sr, (np.clip(wav_out, -1, 1) * 32767).astype(np.int16))

    return gr.Interface(
        fn=edit,
        inputs=[gr.Audio(label="source audio"),
                gr.Textbox(label="original text"),
                gr.Textbox(label="edited text"),
                gr.Textbox(label="region e.g. [4,6]"),
                gr.Textbox(label="edited region e.g. [4,6]")],
        outputs=gr.Audio(label="edited audio"),
        title=hp.get("gradio_title",
                     "speech_editing_tpu — text-based speech editing"),
        description=hp.get("gradio_description", ""))


if __name__ == "__main__":
    from speech_editing_tpu.config.hparams import set_hparams

    build_app(set_hparams()).launch()
