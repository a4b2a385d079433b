"""Spectrogram / alignment figures for TensorBoard.

Parity surface: ``utils/plot/plot.py`` — ``spec_to_figure`` with duration
tick overlay and f0 curve (:11-51), ``plot_mel`` stacked GT/pred figure.
matplotlib is imported lazily with the Agg backend (headless training jobs).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def spec_to_figure(spec: np.ndarray, vmin: Optional[float] = None,
                   vmax: Optional[float] = None, title: str = "",
                   f0s: Optional[dict] = None, dur_info: Optional[dict] = None):
    """mel [T, M] -> matplotlib figure with optional f0 overlay + dur ticks."""
    plt = _plt()
    spec = np.asarray(spec)
    fig = plt.figure(figsize=(12, 6))
    plt.title(title)
    plt.pcolor(spec.T, vmin=vmin, vmax=vmax)
    if dur_info is not None:
        dur_gt = np.asarray(dur_info["dur_gt"])
        frames = np.cumsum(dur_gt)
        for i, x in enumerate(frames):
            plt.vlines(x, 0, spec.shape[1], colors="b", linewidth=0.4, alpha=0.6)
            if "txt" in dur_info and i < len(dur_info["txt"]):
                plt.text((frames[i - 1] if i > 0 else 0), spec.shape[1] - 3,
                         dur_info["txt"][i], fontsize=6)
    if f0s is not None:
        if not isinstance(f0s, dict):
            f0s = {"f0": f0s}
        for name, f0 in f0s.items():
            f0 = np.asarray(f0)
            plt.plot(f0 / 10.0, label=name, linewidth=1)
        plt.legend()
    plt.tight_layout()
    return fig


def figure_to_image(fig) -> np.ndarray:
    """Render a figure to an HWC uint8 array (for TB add_image)."""
    plt = _plt()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf
