"""On-device (jittable) f0 extraction and interpolation.

SURVEY §2.9: the reference's parselmouth (Praat C++) pitch path must have
a jax-compatible equivalent for on-device inference. The host binarizer
uses the numpy tracker in ``utils/audio/pitch.py``; this module is the
same Boersma-style normalized-autocorrelation algorithm expressed in
jax.numpy with static shapes, so the full edit pipeline (mel -> f0 ->
diffusion -> vocoder) can run as ONE XLA program with no host round-trip.

All autocorrelations are FFT-free matmul DFTs (TPU rFFT lowering is ~100x
slower than the equivalent MXU matmuls — see BASELINE.md); framing is a
hop-aligned chunked matmul rather than a gather or conv (both re-read HBM
per-window); the unvoiced-gap interpolation replaces numpy's
data-dependent ``np.interp`` with cumulative-max index fills (jittable,
O(T)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("hop_size", "sample_rate", "f0_min",
                                   "f0_max", "voicing_threshold"))
def extract_pitch_jax(wav: jax.Array, hop_size: int = 256,
                      sample_rate: int = 22050, f0_min: float = 80.0,
                      f0_max: float = 600.0,
                      voicing_threshold: float = 0.45) -> jax.Array:
    """f0 per mel frame (``len(wav) // hop_size`` values, 0 = unvoiced).

    Mirrors ``utils/audio/pitch.py::autocorr_pitch`` (numpy host tracker);
    parity-tested against it in ``tests/test_pitch_ops.py``.
    """
    wav = jnp.asarray(wav, jnp.float32)
    n = wav.shape[-1]
    n_frames = n // hop_size
    if n_frames == 0:
        return jnp.zeros((0,), jnp.float32)

    win = int(round(3.0 / f0_min * sample_rate))
    win = min(win, n)
    half = win // 2
    lag_min = max(2, int(sample_rate / f0_max))
    lag_max = min(win - 2, int(sample_rate / f0_min))
    if lag_max <= lag_min:
        return jnp.zeros((n_frames,), jnp.float32)

    pad = half + 1
    wav_p = jnp.pad(wav, (pad, pad + win))
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    # FFT-free autocorrelation: TPU's rFFT lowering is ~100x slower than
    # the equivalent matmuls (BASELINE.md). rfft of the zero-padded frame
    # = frame @ [cos|sin] (only the first `win` DFT rows are nonzero), and
    # irfft of the (real, even) power spectrum is one cosine-transform
    # matmul truncated to the ``lag_max + 2`` lags actually used.
    #
    # The framing itself must be neither a gather NOR a conv: an
    # advanced-index frame extraction ([T, win] overlapping windows)
    # serializes on TPU, and XLA's conv lowering at HIGHEST precision runs
    # ~25x under matmul speed (measured 3.1 ms vs 0.1 for identical flops).
    # Because the windowed DFT is linear in the frame, framing + windowing
    # + DFT collapse into hop-sized CHUNKED MATMULS: split the win-tap
    # window into ceil(win/hop) hop-aligned chunks, reshape the signal into
    # [S, hop] rows (a free reshape — frame starts are hop-aligned), run ONE
    # einsum against the per-chunk DFT basis, and sum shifted slices. Frame
    # mean subtraction is linear too: subtract ``mean_t * DFT(window)``.
    k = np.arange(nfft // 2 + 1)
    kk = nfft // 2 + 1
    ang = 2.0 * np.pi * np.outer(np.arange(win), k) / nfft
    w_np = np.hanning(win)
    wcos = w_np[:, None] * np.cos(ang)                 # [win, K]
    wsin = w_np[:, None] * np.sin(ang)
    # channels: [cos K | sin K | frame-sum 1]
    basis = np.concatenate([wcos, wsin, np.ones((win, 1))], axis=1)
    n_chunks = -(-win // hop_size)
    pad_win = n_chunks * hop_size
    basis_p = np.zeros((pad_win, basis.shape[1]), np.float32)
    basis_p[:win] = basis
    chunks = jnp.asarray(
        basis_p.reshape(n_chunks, hop_size, -1))       # [C, hop, 2K+1]
    ones_c = jnp.asarray(
        basis_p[:, -1].reshape(n_chunks, hop_size))    # [C, hop]
    hi = jax.lax.Precision.HIGHEST
    x = wav_p[hop_size // 2 + 1:]                      # frame t starts at t*hop
    s_rows = n_frames - 1 + n_chunks
    need = s_rows * hop_size
    x = jnp.pad(x[:need], (0, max(0, need - x.shape[0])))
    xr = x.reshape(s_rows, hop_size)                   # [S, hop] free reshape
    y = jnp.einsum("sj,cjo->cso", xr, chunks, precision=hi)
    q = jnp.einsum("sj,cj->cs", xr * xr, ones_c, precision=hi)
    dft = sum(y[c, c:c + n_frames] for c in range(n_chunks))
    sq = sum(q[c, c:c + n_frames] for c in range(n_chunks))[:, None] / win
    re_raw = dft[:, :kk]                               # [T, K]
    im_raw = dft[:, kk:2 * kk]
    mean = dft[:, -1:] / win                           # [T, 1]
    # mean-subtracted windowed DFT: DFT(w*(x - m)) = DFT(w*x) - m * DFT(w)
    re = re_raw - mean * jnp.asarray(wcos.sum(0), jnp.float32)[None, :]
    im = im_raw - mean * jnp.asarray(wsin.sum(0), jnp.float32)[None, :]
    power = re * re + im * im                          # [T, K]
    lags = np.arange(lag_max + 2)
    coef = np.full(nfft // 2 + 1, 2.0)
    coef[0] = 1.0
    if nfft % 2 == 0:
        coef[-1] = 1.0
    inv = np.cos(2.0 * np.pi * np.outer(k, lags) / nfft) * coef[:, None] / nfft
    ac = jnp.einsum("tk,kl->tl", power, jnp.asarray(inv, jnp.float32),
                    precision=hi)                      # [T, lag_max + 2]
    # window autocorrelation normalizer: trace-time numpy constant
    wac_np = np.fft.irfft(np.abs(np.fft.rfft(np.hanning(win), nfft)) ** 2,
                          nfft)[: lag_max + 2]
    wac = jnp.asarray(np.maximum(wac_np / wac_np[0], 1e-6), jnp.float32)
    ac0 = jnp.maximum(ac[:, :1], 1e-12)
    r = (ac / ac0) / wac[None, :]

    seg = r[:, lag_min: lag_max + 1]
    best = jnp.argmax(seg, axis=1) + lag_min
    r_m1 = jnp.take_along_axis(r, (best - 1)[:, None], axis=1)[:, 0]
    r_0 = jnp.take_along_axis(r, best[:, None], axis=1)[:, 0]
    r_p1 = jnp.take_along_axis(r, (best + 1)[:, None], axis=1)[:, 0]
    denom = r_m1 - 2 * r_0 + r_p1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (r_m1 - r_p1) / denom, 0.0)
    delta = jnp.clip(delta, -1, 1)
    lag = best + delta
    f0 = sample_rate / jnp.maximum(lag, 1e-6)

    # rms of the mean-subtracted (unwindowed) frame: E[x^2] - E[x]^2
    rms = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0))[:, 0]
    voiced = (r_0 > voicing_threshold) & (rms > 1e-4 + 0.02 * jnp.median(rms))
    f0 = jnp.where(voiced & (f0 >= f0_min) & (f0 <= f0_max), f0, 0.0)

    if n_frames >= 3:
        stacked = jnp.stack([jnp.roll(f0, -1), f0, jnp.roll(f0, 1)], axis=1)
        f0_smooth = jnp.median(stacked, axis=1)
        f0 = jnp.where(f0 > 0, jnp.where(f0_smooth > 0, f0_smooth, f0), 0.0)
    return f0.astype(jnp.float32)


@jax.jit
def interp_unvoiced_jax(f0: jax.Array) -> jax.Array:
    """Linear interpolation through unvoiced (f0==0) gaps, jittable.

    Replaces numpy's data-dependent ``np.interp`` over voiced indices
    (``utils/audio/pitch.py::norm_interp_f0``) with cumulative index fills:
    for every frame find the nearest voiced frame on each side via
    cummax / reversed-cummax, then blend linearly. Frames before the first
    (after the last) voiced frame copy the nearest voiced value; an
    all-unvoiced track stays all-zero.
    """
    f0 = jnp.asarray(f0, jnp.float32)
    t = f0.shape[-1]
    pos = jnp.arange(t)
    voiced = f0 > 0
    # nearest voiced index to the left (-1 if none), to the right (t if none)
    left = jax.lax.cummax(jnp.where(voiced, pos, -1))
    right = t - 1 - jax.lax.cummax(
        jnp.where(voiced[::-1], pos, -1))[::-1]
    right_valid = jax.lax.cummax(jnp.where(voiced[::-1], 1, 0))[::-1] > 0
    left_valid = left >= 0

    f0_left = f0[jnp.clip(left, 0, t - 1)]
    f0_right = f0[jnp.clip(right, 0, t - 1)]
    span = jnp.maximum(right - left, 1)
    wgt = (pos - left) / span
    interp = f0_left * (1 - wgt) + f0_right * wgt
    # one-sided fills at the edges
    interp = jnp.where(left_valid & ~right_valid, f0_left, interp)
    interp = jnp.where(~left_valid & right_valid, f0_right, interp)
    interp = jnp.where(left_valid | right_valid, interp, 0.0)
    return jnp.where(voiced, f0, interp)


@jax.jit
def norm_interp_f0_jax(f0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Jittable ``norm_interp_f0`` (log norm + gap interpolation): returns
    (log2-normalized interpolated f0, uv mask). Like the host version the
    interpolation runs in the log domain (voiced log2 values are anchors)."""
    uv = (f0 == 0).astype(jnp.float32)
    log_f0 = jnp.where(uv > 0, 0.0, jnp.log2(f0 + 1e-8))
    return interp_unvoiced_jax(log_f0), uv
