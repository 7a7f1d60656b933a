"""Patch -> chromosome reassembly and denoised contact-map export.

The reference pipeline ends at patch-level npy dumps
(`src/Utils/metrics_cond.py:126-134` saves the Outputs_diff quartet and its
3DComp scripts consume patches directly) — nothing ever reassembles the
denoised 64x64 band patches back into the chromosome contact matrices a Hi-C
user actually works with, and nothing writes a cooler file back out. This
module closes that gap:

- `band_tile_offsets` re-derives the (i, j) grid position of every patch by
  mirroring `split_pieces`' enumeration exactly
  (PrepareData_linear.py:25-46 / preprocess.split_pieces);
- `assemble_chromosome` scatters patches into a symmetric dense matrix
  (off-band entries stay 0 — the band rule means they were never modeled);
- `write_mcool` emits a minimal schema-correct single-resolution .mcool
  (the cooler layout read by `data/mcool.py`), giving the full round trip
  noisy .mcool -> denoise -> denoised .mcool.

Matrices are in the pipeline's normalized space ([-1, 1], percentile-clipped
Full_Mats units, compacted rows — `normalize_matrix` removes zero/NaN-diagonal
bins like the reference and the bin removal is not recorded); `to_unit`
rescales to [0, 1] for export. All host-side numpy: assembly is I/O-bound
bookkeeping, not device math.
"""
from __future__ import annotations

import os
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

__all__ = [
    "band_tile_offsets",
    "assemble_chromosome",
    "assemble_by_chromosome",
    "to_unit",
    "write_mcool",
]


def band_tile_offsets(
    n_bins: int, piece_size: int = 64, step: Optional[int] = None,
    resol: int = 40000,
) -> np.ndarray:
    """(n_tiles, 2) array of upper-triangle (i, j) tile origins, in exactly
    `split_pieces`' enumeration order (so `patches[k]` sits at `offsets[k]`).
    `step` defaults to `piece_size` — non-overlapping tiles, the pipeline's
    only configuration."""
    step = piece_size if step is None else step
    scal = int(40000 / resol)
    rest = n_bins % piece_size
    bound = n_bins + (piece_size - rest if rest else 0)
    band = int(piece_size * 4 * scal + 1)
    offsets = [
        (i, j)
        for i in range(0, bound, step)
        for j in range(i, bound, step)
        if abs(i - j) <= band and i + step <= bound and j + step <= bound
    ]
    return np.asarray(offsets, dtype=np.int64).reshape(-1, 2)


def assemble_chromosome(
    patches: np.ndarray,
    n_bins: int,
    piece_size: int = 64,
    step: Optional[int] = None,
    resol: int = 40000,
    symmetrize: bool = True,
) -> np.ndarray:
    """Scatter (n, 1, p, p) or (n, p, p) patches back into an (n_bins, n_bins)
    symmetric matrix. Inverse of `split_pieces` on the modeled band; off-band
    entries are 0. Diagonal tiles are averaged with their transpose and
    off-diagonal tiles mirrored, so the result is exactly symmetric even when
    the model's per-patch output is not."""
    patches = np.asarray(patches, dtype=np.float32)
    if patches.ndim == 4:  # accept NCHW (cache layout) or NHWC (device layout)
        patches = patches[:, 0] if patches.shape[1] == 1 else patches[..., 0]
    offsets = band_tile_offsets(n_bins, piece_size, step, resol)
    if patches.shape[0] != offsets.shape[0]:
        raise ValueError(
            f"{patches.shape[0]} patches for a {n_bins}-bin chromosome; the "
            f"band grid has {offsets.shape[0]} tiles — wrong chromosome, "
            "piece size, or resolution"
        )
    bound = n_bins + ((piece_size - n_bins % piece_size) % piece_size)
    mat = np.zeros((bound, bound), dtype=np.float32)
    for (i, j), tile in zip(offsets, patches):
        if symmetrize and i == j:
            mat[i : i + piece_size, j : j + piece_size] = (tile + tile.T) / 2.0
        else:
            mat[i : i + piece_size, j : j + piece_size] = tile
            if symmetrize:
                mat[j : j + piece_size, i : i + piece_size] = tile.T
    return mat[:n_bins, :n_bins]


def assemble_by_chromosome(
    patches: np.ndarray,
    inds: np.ndarray,
    n_bins_per_chrom: Mapping[int, int],
    piece_size: int = 64,
    step: Optional[int] = None,
    resol: int = 40000,
) -> Dict[int, np.ndarray]:
    """Group a concatenated prediction array by its `inds` chromosome labels
    (the Outputs_diff quartet contract — patches stay in split order within
    each chromosome because the test loader never shuffles) and assemble each
    chromosome present in `n_bins_per_chrom`."""
    patches = np.asarray(patches)
    inds = np.asarray(inds)
    out: Dict[int, np.ndarray] = {}
    for chro, n_bins in n_bins_per_chrom.items():
        sel = patches[inds == chro]
        if sel.shape[0] == 0:
            continue
        out[chro] = assemble_chromosome(sel, n_bins, piece_size, step, resol)
    return out


def to_unit(mat: np.ndarray) -> np.ndarray:
    """[-1, 1] normalized space -> [0, 1] (inverse_data_transform 'rescaled',
    src/datasets/__init__.py:214-223)."""
    return np.clip((np.asarray(mat) + 1.0) / 2.0, 0.0, 1.0)


def write_mcool(
    path: str,
    res: int,
    mats: Mapping[int, np.ndarray],
    chrom_names: Optional[Sequence[str]] = None,
    value_scale: float = 1.0,
) -> str:
    """Write per-chromosome dense matrices as a minimal single-resolution
    .mcool (the subset of the cooler schema `data/mcool.py` reads: chroms/,
    bins/, pixels/ with bin1_offset + chrom_offset indexes, unit weights).

    `mats` maps chromosome NUMBER (1-based, the pipeline's `inds` label) to a
    dense symmetric matrix; only the upper triangle's nonzero entries are
    stored, as float32 counts scaled by `value_scale`.
    """
    import h5py

    chros = sorted(mats)
    names = chrom_names or [f"chr{c}" for c in chros]
    sizes = [int(mats[c].shape[0]) for c in chros]
    n_bins = int(sum(sizes))

    chrom_of_bin = np.repeat(np.arange(len(chros), dtype=np.int32), sizes)
    start_of_bin = np.concatenate(
        [np.arange(n, dtype=np.int64) * res for n in sizes]
    )
    bin1, bin2, count = [], [], []
    offset = 0
    for c, n in zip(chros, sizes):
        iu, ju = np.triu_indices(n)
        vals = np.asarray(mats[c], dtype=np.float32)[iu, ju] * value_scale
        keep = vals != 0
        bin1.append(iu[keep] + offset)
        bin2.append(ju[keep] + offset)
        count.append(vals[keep])
        offset += n
    bin1 = np.concatenate(bin1).astype(np.int64)
    bin2 = np.concatenate(bin2).astype(np.int64)
    count = np.concatenate(count).astype(np.float32)
    order = np.lexsort((bin2, bin1))
    bin1, bin2, count = bin1[order], bin2[order], count[order]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group(f"resolutions/{res}")
        # size the fixed-width dtype from the longest name: a hard-coded S16
        # would silently truncate alt/scaffold contigs (e.g.
        # 'chr19_GL949746v1_alt'), breaking fetch-by-name on the output
        name_bytes = [str(n).encode() for n in names]
        width = max(1, max(len(b) for b in name_bytes))
        g.create_dataset(
            "chroms/name", data=np.array(name_bytes, dtype=f"S{width}")
        )
        g.create_dataset(
            "chroms/length", data=np.asarray(sizes, np.int64) * res
        )
        g.create_dataset("bins/chrom", data=chrom_of_bin)
        g.create_dataset("bins/start", data=start_of_bin)
        g.create_dataset("bins/end", data=start_of_bin + res)
        g.create_dataset("bins/weight", data=np.ones(n_bins))
        g.create_dataset("pixels/bin1_id", data=bin1)
        g.create_dataset("pixels/bin2_id", data=bin2)
        g.create_dataset("pixels/count", data=count)
        g.create_dataset(
            "indexes/bin1_offset",
            data=np.searchsorted(bin1, np.arange(n_bins + 1)).astype(np.int64),
        )
        g.create_dataset(
            "indexes/chrom_offset",
            data=np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64),
        )
    return path
