"""Legacy loaders kept for utility-surface parity with src/Utils/utils.py.

The reference carries an older generation of loaders (diagonal-only patching,
99.9-percentile normalization, 40x40 splitting) that the live path no longer
uses (SURVEY.md §2.6) but that remain part of its public utility surface.
"""
from __future__ import annotations

import numpy as np

__all__ = ["split_pieces_diagonal", "load_constraints_999", "split_to_40"]


def split_pieces_diagonal(data: np.ndarray, piece_size: int, step: int) -> np.ndarray:
    """Diagonal-only patching (utils.py:9-17): square windows marching down the
    main diagonal at `step`, no off-diagonal band."""
    pieces = []
    bound = data.shape[0] - piece_size
    for i in range(0, bound, step):
        pieces.append(data[i : i + piece_size, i : i + piece_size])
    pieces = np.asarray(pieces, dtype=np.float32)
    return np.expand_dims(pieces, 1)


def load_constraints_999(stri: str, res: int) -> np.ndarray:
    """COO txt -> dense with 99.9-percentile clip to [0,1] (utils.py:45-84)."""
    from hicdiff_tpu.data.fastio import load_coo_txt

    m = load_coo_txt(stri)
    rows = (m[:, 0] / res).astype(int)
    cols = (m[:, 1] / res).astype(int)
    vals = m[:, 2]
    bigbin = int(max(rows.max(), cols.max()))
    smallbin = int(min(rows.min(), cols.min()))
    n = bigbin - smallbin + 1
    mat = np.zeros((n, n), dtype="float32")
    mat[rows - smallbin, cols - smallbin] = vals
    mat[cols - smallbin, rows - smallbin] = vals
    per = np.percentile(mat, 99.9)
    mat = np.clip(mat, 0, per)
    if per > 0:
        mat = mat / per
    return mat


def split_to_40(mats: np.ndarray) -> np.ndarray:
    """(n, 1, 80, 80) -> (4n, 1, 40, 40) quadrant splitting (utils.py:106-113)."""
    out = []
    for m in mats:
        a = m[0]
        h = a.shape[0] // 2
        out += [a[:h, :h], a[:h, h:], a[h:, :h], a[h:, h:]]
    return np.expand_dims(np.asarray(out, dtype=np.float32), 1)
