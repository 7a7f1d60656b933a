"""GenomeDISCO reproducibility score.

Numpy re-implementation of /root/reference/src/Utils/GenomeDISCO.py:8-99 (itself
from kundajelab/genomedisco): row-normalized transition matrices, t-step random
walks (tmin=tmax=3 in all reference uses), score = 1 - |rw1 - rw2|.sum() / nonzero,
clamped to auc in [0, 2].
"""
from __future__ import annotations

import numpy as np

__all__ = ["to_transition", "compute_reproducibility"]


def to_transition(m: np.ndarray) -> np.ndarray:
    sums = m.sum(axis=1)
    sums[sums == 0.0] = 1.0
    return m / sums[:, None]


def compute_reproducibility(
    m1: np.ndarray, m2: np.ndarray, transition: bool = True, tmax: int = 3, tmin: int = 3
) -> float:
    m1 = np.asarray(m1, dtype=np.float64)
    m2 = np.asarray(m2, dtype=np.float64)
    if transition:
        m1 = to_transition(m1)
        m2 = to_transition(m2)

    nonzero_1 = (m1.sum(axis=1) > 0.0).sum()
    nonzero_2 = (m2.sum(axis=1) > 0.0).sum()
    nonzero_total = 0.5 * (float(nonzero_1) + float(nonzero_2))
    if nonzero_total == 0:
        nonzero_total = 1.0

    scores = []
    rw1, rw2 = m1, m2
    for t in range(1, tmax + 1):
        if t > 1:
            rw1 = rw1 @ m1
            rw2 = rw2 @ m2
        if t >= tmin:
            diff = np.abs(rw1 - rw2).sum()
            scores.append(float(diff) / nonzero_total)

    if tmin == tmax:
        auc = scores[0]
        auc = min(auc, 2.0) if auc >= 0 else auc
    else:
        from sklearn import metrics as skmetrics

        ts = range(tmin, tmax + 1)
        denom = len(list(ts)) - 1
        auc = skmetrics.auc(range(len(list(ts))), scores) / denom
    return 1.0 - auc
