"""Speaker (d-vector) encoder — flax re-implementation of resemblyzer.

Parity surface: the reference binarizer's speaker-embedding pass
(``data_gen/tts/base_binarizer.py:115-123``) runs resemblyzer's
``VoiceEncoder`` (torch): 3-layer LSTM(40 -> 256) over 40-mel partials at
16 kHz, Linear(256, 256) + ReLU on the last hidden state, L2 normalize;
utterance embedding = L2-normalized mean over overlapping partials
(GE2E, Wan et al. 2018).

The LSTM parameters use the torch layout (``weight_ih [4H, D]`` with
i/f/g/o gate chunks) so resemblyzer's ``pretrained.pt`` converts by direct
copy (:func:`convert_resemblyzer_state`); forward parity vs ``torch.nn.LSTM``
is tested in ``tests/test_voice_encoder.py``. When no checkpoint is
available the binarizer keeps its deterministic spectral-stats fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VE_SR = 16000
VE_N_FFT = 400
VE_HOP = 160
VE_N_MELS = 40
VE_PARTIAL_FRAMES = 160


class TorchLSTMLayer(nn.Module):
    """One LSTM layer with torch parameter layout and semantics."""

    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, D] -> [B, T, H]
        d = x.shape[-1]
        h4 = 4 * self.hidden
        scale = 1.0 / np.sqrt(self.hidden)

        def init(key, shape):  # torch LSTM default: U(-1/sqrt(H), 1/sqrt(H))
            return jax.random.uniform(key, shape, jnp.float32, -scale, scale)

        w_ih = self.param("weight_ih", init, (h4, d))
        w_hh = self.param("weight_hh", init, (h4, self.hidden))
        b_ih = self.param("bias_ih", init, (h4,))
        b_hh = self.param("bias_hh", init, (h4,))

        def cell(carry, xt):
            h, c = carry
            gates = xt @ w_ih.T + h @ w_hh.T + b_ih + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), x.dtype)
        (_, _), hs = jax.lax.scan(cell, (h0, h0), jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(hs, 0, 1)


class VoiceEncoder(nn.Module):
    """resemblyzer VoiceEncoder: partial mel [B, T, 40] -> d-vector [B, 256]."""

    hidden: int = 256
    n_layers: int = 3
    out_dim: int = 256

    @nn.compact
    def __call__(self, mels: jax.Array) -> jax.Array:
        x = mels
        for layer in range(self.n_layers):
            x = TorchLSTMLayer(self.hidden, name=f"lstm_l{layer}")(x)
        raw = nn.relu(nn.Dense(self.out_dim, name="linear")(x[:, -1]))
        return raw / (jnp.linalg.norm(raw, axis=-1, keepdims=True) + 1e-8)


def convert_resemblyzer_state(state_dict: dict, n_layers: int = 3) -> dict:
    """torch state_dict (resemblyzer pretrained.pt ``model_state`` or an
    equivalent ``torch.nn.LSTM``+``Linear`` module) -> flax params tree."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t, np.float32)

    params = {}
    for layer in range(n_layers):
        params[f"lstm_l{layer}"] = {
            "weight_ih": _np(state_dict[f"lstm.weight_ih_l{layer}"]),
            "weight_hh": _np(state_dict[f"lstm.weight_hh_l{layer}"]),
            "bias_ih": _np(state_dict[f"lstm.bias_ih_l{layer}"]),
            "bias_hh": _np(state_dict[f"lstm.bias_hh_l{layer}"]),
        }
    params["linear"] = {"kernel": _np(state_dict["linear.weight"]).T,
                        "bias": _np(state_dict["linear.bias"])}
    return {"params": params}


# -- host-side utterance embedding (binarizer path) ---------------------------

def ve_mel(wav_16k: np.ndarray) -> np.ndarray:
    """40-mel power spectrogram [T, 40] at resemblyzer's frontend params
    (librosa.feature.melspectrogram n_fft=400, hop=160 — no log, matching
    resemblyzer/audio.py)."""
    from speech_editing_tpu.utils.audio.dsp import mel_filterbank, stft

    spec = np.abs(stft(wav_16k, VE_N_FFT, VE_HOP, VE_N_FFT)) ** 2
    fb = mel_filterbank(VE_SR, VE_N_FFT, VE_N_MELS, 0, VE_SR / 2)
    return (fb @ spec).T.astype(np.float32)


def compute_partial_slices(n_frames: int, rate: float = 1.3,
                           min_coverage: float = 0.75):
    """Overlapping [start, end) mel-frame slices of VE_PARTIAL_FRAMES."""
    frame_step = max(1, int(round(VE_SR / rate / VE_HOP)))
    slices = []
    steps = max(1, n_frames - VE_PARTIAL_FRAMES + frame_step + 1)
    for start in range(0, steps, frame_step):
        end = start + VE_PARTIAL_FRAMES
        slices.append((start, min(end, n_frames)))
    if len(slices) > 1:
        last_start, last_end = slices[-1]
        if (last_end - last_start) / VE_PARTIAL_FRAMES < min_coverage:
            slices = slices[:-1]
    return slices


class VoiceEncoderCtx:
    """Callable context for the binarizer workers: wav -> 256-d embedding."""

    def __init__(self, variables: Optional[dict] = None, seed: int = 0):
        self.model = VoiceEncoder()
        if variables is None:
            # architecture-only mode (no pretrained ckpt in this env):
            # fixed-seed random params still give a deterministic,
            # speaker-discriminative projection
            dummy = jnp.zeros((1, VE_PARTIAL_FRAMES, VE_N_MELS))
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables
        self._apply = jax.jit(self.model.apply)

    def embed_utterance(self, wav: np.ndarray, source_sr: int = 22050
                        ) -> np.ndarray:
        from scipy.signal import resample_poly

        wav = np.asarray(wav, np.float32)
        if source_sr != VE_SR:
            g = np.gcd(int(source_sr), VE_SR)
            wav = resample_poly(wav, VE_SR // g, source_sr // g).astype(
                np.float32)
        mel = ve_mel(wav)
        slices = compute_partial_slices(len(mel))
        parts = []
        for s, e in slices:
            p = mel[s:e]
            if len(p) < VE_PARTIAL_FRAMES:  # zero-pad the tail partial
                p = np.pad(p, ((0, VE_PARTIAL_FRAMES - len(p)), (0, 0)))
            parts.append(p)
        n_real = len(parts)
        # pad the partial count to a power-of-two bucket: the LSTM scan then
        # compiles once per bucket, not once per utterance length (CLAUDE.md:
        # keep distinct jit shapes low — compiles are minutes on 1-CPU hosts)
        n_pad = int(2 ** np.ceil(np.log2(max(n_real, 1))))
        parts += [np.zeros_like(parts[0])] * (n_pad - n_real)
        batch = jnp.asarray(np.stack(parts))
        embeds = np.asarray(self._apply(self.variables, batch))[:n_real]
        mean = embeds.mean(0)
        return (mean / (np.linalg.norm(mean) + 1e-8)).astype(np.float32)


def load_voice_encoder(ckpt_path: str) -> VoiceEncoderCtx:
    """Build a context from a resemblyzer torch checkpoint."""
    import torch

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    state = payload.get("model_state", payload)
    return VoiceEncoderCtx(convert_resemblyzer_state(state))
