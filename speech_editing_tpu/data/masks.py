"""Time-mask generators for speech editing (host-side numpy, explicit RNG).

Parity surface: ``utils/spec_aug/time_mask.py`` —
``generate_time_mask`` (:6-48, random contiguous span of ratio*T frames),
``generate_alignment_aware_time_mask`` (:50-70, random phone subset expanded
to frames via mel2ph), ``generate_inference_mask`` (:72-93, one contiguous
phone span of ratio*num_ph).

Differences: randomness comes from an explicit ``np.random.RandomState``
(reproducible per item), and masks are float32 [T] arrays.
"""

from __future__ import annotations

import numpy as np


def generate_time_mask(t_frames: int, ratio: float,
                       rng: np.random.RandomState) -> np.ndarray:
    """Random contiguous frame span covering ``ratio`` of the mel."""
    mask_length = int(t_frames * ratio)
    pos = rng.randint(0, max(1, t_frames - mask_length))
    mask = np.zeros(t_frames, np.float32)
    mask[pos: pos + mask_length] = 1.0
    return mask


def _ph_mask_to_frames(ph_mask: np.ndarray, mel2ph: np.ndarray) -> np.ndarray:
    """Expand a phone-level mask [P+1] to frames via mel2ph gather
    (index 0 = padding, always unmasked)."""
    padded = np.concatenate([[0.0], ph_mask]).astype(np.float32)
    return padded[mel2ph]


def generate_alignment_aware_time_mask(mel2ph: np.ndarray, ratio: float,
                                       rng: np.random.RandomState) -> np.ndarray:
    """Mask a random subset of phones (ratio of the phone count), expanded
    to frame level."""
    num_ph = int(mel2ph.max())
    if num_ph <= 0:
        return np.zeros(len(mel2ph), np.float32)
    n_masked = int((num_ph + 1) * ratio)
    ph_mask = np.zeros(num_ph, np.float32)
    if n_masked > 0:
        idx = rng.choice(num_ph, size=min(n_masked, num_ph), replace=False)
        ph_mask[idx] = 1.0
    return _ph_mask_to_frames(ph_mask, mel2ph)


def generate_inference_mask(mel2ph: np.ndarray, ratio: float,
                            rng: np.random.RandomState) -> np.ndarray:
    """One contiguous phone span of ``ratio`` of the phones (the
    reference's 50%-span eval mask)."""
    num_ph = int(mel2ph.max())
    if num_ph <= 0:
        return np.zeros(len(mel2ph), np.float32)
    span = int(num_ph * ratio)
    start = rng.randint(0, max(1, num_ph - span + 1))
    ph_mask = np.zeros(num_ph, np.float32)
    ph_mask[start: start + span] = 1.0
    return _ph_mask_to_frames(ph_mask, mel2ph)
