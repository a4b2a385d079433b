"""Fused mel-spectrogram Pallas kernel: window + DFT + |.| + mel + log10.

TPU-native replacement for the librosa STFT->mel path
(``utils/audio/__init__.py:64-75`` in the reference) as ONE kernel:

* the wav is reshaped host-side into hop-sized chunks [T+3, hop]; inside the
  kernel each 128-frame tile builds its overlapping frames by concatenating
  4 shifted chunk slices (pure VMEM slicing, no gather, no [T, n_fft]
  intermediate in HBM);
* the rDFT runs as two MXU matmuls against cos/sin bases (the MXU at fp32
  beats an FFT's low arithmetic intensity for n_fft=1024 tiles);
* magnitude, mel projection (third MXU matmul) and log10 are fused in the
  same kernel — the only HBM traffic is wav in, [T, 80] mel out.

Numerics match ``ops.mel.mel_spectrogram`` (center=True, constant pad,
periodic hann, slaney mel, log10(max(eps, .))). Requires hop*4 == n_fft
(the standard 1024/256 config); falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from speech_editing_tpu.ops.mel import MelConfig, _constants, _dft_bases
from speech_editing_tpu.ops.mel import mel_spectrogram as mel_spectrogram_xla

TILE = 128


def _kernel(c0_ref, c1_ref, c2_ref, c3_ref, cos_ref, sin_ref, fb_ref,
            out_ref, *, eps: float):
    """One 128-frame tile -> [TILE, n_mels].

    The four inputs are hop-shifted chunk views (pre-shifted host-side so
    every kernel slice is tile-aligned — Mosaic needs 8-aligned sublane
    offsets); frame build is a concat, all compute is three MXU matmuls.
    The hann window is folded into the DFT bases.
    """
    frames = jnp.concatenate(
        [c0_ref[:], c1_ref[:], c2_ref[:], c3_ref[:]], axis=1)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    amp = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.dot(amp, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(eps, mel))


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram_pallas(wav: jax.Array, cfg: MelConfig = MelConfig()
                           ) -> jax.Array:
    """[B, N] (or [N]) wav -> [B, T, num_mels] log10-mel, T = N//hop + 1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.hop_size * 4 != cfg.fft_size:
        return mel_spectrogram_xla(wav, cfg)
    if wav.ndim == 1:
        wav = wav[None]
    b, n = wav.shape
    hop, n_fft = cfg.hop_size, cfg.fft_size
    n_frames = n // hop + 1

    w, basis = _constants(cfg)
    cos_b, sin_b = _dft_bases(n_fft)
    # fold the window into the DFT bases: (f*w) @ C == f @ (w[:,None]*C)
    cos_w = jnp.asarray(w[:, None] * cos_b)
    sin_w = jnp.asarray(w[:, None] * sin_b)
    fb_t = jnp.asarray(basis.T)  # [n_bins, n_mels]

    # center pad + tile pad, then chunk rows of hop samples
    n_tiles = -(-n_frames // TILE)
    padded_len = (n_tiles * TILE + 3) * hop
    wav_p = jnp.pad(wav, ((0, 0), (n_fft // 2, padded_len - n - n_fft // 2)))
    chunks = wav_p.reshape(b, -1, hop)  # [B, n_tiles*TILE + 3, hop]

    kern = functools.partial(_kernel, eps=cfg.eps)
    interpret = jax.default_backend() not in ("tpu", "axon")
    rows = n_tiles * TILE
    chunk_spec = pl.BlockSpec((TILE, hop), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    def one(chunks_1):
        shifted = [chunks_1[k: k + rows] for k in range(4)]
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[chunk_spec] * 4 + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, cfg.num_mels), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cfg.num_mels), jnp.float32),
            interpret=interpret,
        )(*shifted, cos_w, sin_w, fb_t)

    out = jax.vmap(one)(chunks.astype(jnp.float32))
    return out[:, :n_frames]
