"""Visualization panels for contact-map results.

File-writing re-design of the reference's interactive matplotlib QA panels
(stard_metrics.py:185-210 noisy/target/predict heatmaps; 3DComp.py:214-257
multi-model comparison rows). Headless: always saves PNG, never plt.show().
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["save_comparison_panel", "save_outputs_panel"]


def save_comparison_panel(
    mats: Dict[str, np.ndarray],
    out_path: str,
    *,
    cmap: str = "Reds",
    title: Optional[str] = None,
    clamp: Optional[tuple] = None,
):
    """One row of heatmaps, one per named matrix (2D each)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(mats)
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 4))
    if len(names) == 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        m = np.asarray(mats[name])
        if clamp:
            m = np.clip(m, *clamp)
        im = ax.imshow(m, cmap=cmap)
        ax.set_title(name)
        ax.set_xticks([])
        ax.set_yticks([])
        fig.colorbar(im, ax=ax, location="bottom", orientation="horizontal")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def save_outputs_panel(outputs_dir: str, out_path: str, index: int = 7):
    """Noisy/Target/Predict panel from an Outputs_diff quartet — the
    stard_metrics.py:185-210 QA view for a chosen patch index."""
    import os

    arrays = {
        "Noisy": np.load(os.path.join(outputs_dir, "noisy.npy")),
        "Target": np.load(os.path.join(outputs_dir, "target.npy")),
        "Predict": np.load(os.path.join(outputs_dir, "predict.npy")),
    }
    index = min(index, arrays["Target"].shape[0] - 1)
    panel = {k: v[index, 0] for k, v in arrays.items()}
    panel["Predict (clamped)"] = np.clip(panel["Predict"], -1, 1)
    return save_comparison_panel(panel, out_path)
