"""DeepHiC-lineage matrix utilities.

Vectorized numpy re-designs of /root/reference/src/Utils/io.py (itself from
omegahh/DeepHiC): norm-file COO reading, compact/spread index mapping,
dense<->tag conversions, read downsampling, 40x40 chunk divide/reassemble,
pooling, sparse export helpers. These are not on the live diffusion path
(SURVEY.md §2.6) but are part of the framework's utility surface.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "readcoo2mat",
    "compactM",
    "spreadM",
    "spreadMdict",
    "dense2tag",
    "tag2dense",
    "downsampling",
    "divide",
    "together",
    "pooling",
    "dense2sparse",
    "reference_regions",
    "get_region",
]

except_chr = {"hsa": {"X": 23, 23: "X"}, "mouse": {"X": 20, 20: "X"}}


def readcoo2mat(coo_file: str, norm_file: str, resolution: int):
    """COO tag file + KR-norm vector -> normalized dense matrix (io.py:10-27)."""
    norm = np.array([float(line) for line in open(norm_file)])
    compact_idx = list(np.where(~np.isnan(norm))[0])
    tags = np.loadtxt(coo_file, dtype=np.int64).reshape(-1, 3)
    row = tags[:, 0] // resolution
    col = tags[:, 1] // resolution
    val = tags[:, 2].astype(float)
    n = len(norm)
    mat = np.zeros((n, n))
    np.add.at(mat, (row, col), val)
    norm = np.where(np.isnan(norm), 1.0, norm)
    mat = mat / norm
    mat = mat.T / norm
    hic = mat + np.tril(mat, -1).T
    return hic.astype(int), compact_idx


def compactM(matrix: np.ndarray, compact_idx, verbose: bool = False) -> np.ndarray:
    """Select the compact submatrix (io.py:30-39), vectorized."""
    idx = np.asarray(compact_idx)
    return matrix[np.ix_(idx, idx)].astype(matrix.dtype)


def spreadM(c_mat, compact_idx, full_size, convert_int=True, verbose=False):
    """Inverse of compactM (io.py:42-51)."""
    dtype = np.int64 if convert_int else c_mat.dtype
    result = np.zeros((full_size, full_size), dtype=dtype)
    idx = np.asarray(compact_idx)
    result[np.ix_(idx, idx)] = c_mat
    return result


def spreadMdict(mats, compacts, sizes, convert_int=True, verbose=False):
    return {
        k: spreadM(mats[k], compacts[k], sizes[k], convert_int, verbose)
        for k in mats
    }


def dense2tag(matrix: np.ndarray):
    """Dense -> per-read (row, col) tag list (io.py:61-75), vectorized repeat."""
    m = np.triu(matrix).astype(np.int64)
    rows, cols = np.nonzero(m)
    counts = m[rows, cols]
    tag_mat = np.stack(
        [np.repeat(rows, counts), np.repeat(cols, counts)], axis=1
    )
    return tag_mat, int(counts.sum())


def tag2dense(tag: np.ndarray, nsize: int) -> np.ndarray:
    """Tag list -> dense symmetric matrix (io.py:78-86)."""
    coo, counts = np.unique(tag, axis=0, return_counts=True)
    mat = np.zeros((nsize, nsize), dtype=np.int64)
    np.add.at(mat, (coo[:, 0], coo[:, 1]), counts)
    return mat + np.triu(mat, k=1).T


def downsampling(matrix: np.ndarray, down_ratio: int, verbose=False, seed=None):
    """Read-level downsampling (io.py:89-99). Seeded for reproducibility
    (the reference uses global np.random)."""
    tag_mat, tag_len = dense2tag(matrix)
    rng = np.random.default_rng(seed)
    sample_idx = rng.choice(tag_len, tag_len // down_ratio)
    return tag2dense(tag_mat[sample_idx], matrix.shape[0])


def divide(
    mat, chr_num, chunk_size=40, stride=28, bound=201, padding=True,
    species="hsa", verbose=False,
):
    """Strided chunking with diagonal bound (io.py:102-128). Note the reference
    uses strict `<` bounds (i + chunk_size < height), preserved here."""
    if isinstance(chr_num, str):
        chr_num = except_chr[species][chr_num]
    result, index = [], []
    size = mat.shape[0]
    if stride < chunk_size and padding:
        pad_len = (chunk_size - stride) // 2
        mat = np.pad(mat, ((pad_len, pad_len), (pad_len, pad_len)), "constant")
    height, width = mat.shape
    assert height == width
    for i in range(0, height, stride):
        for j in range(0, width, stride):
            if abs(i - j) <= bound and i + chunk_size < height and j + chunk_size < width:
                result.append([mat[i : i + chunk_size, j : j + chunk_size]])
                index.append((chr_num, size, i, j))
    return np.array(result), np.array(index)


def together(matlist, indices, corp=0, species="hsa", tag="HiC"):
    """Reassemble chunks into full matrices per chromosome (io.py:131-156)."""
    matlist = np.asarray(matlist)
    chr_nums = sorted(list(np.unique(indices[:, 0])))
    results = {}
    for n in chr_nums:
        num = except_chr[species][n] if isinstance(n, str) else n
        loci = np.where(indices[:, 0] == num)[0]
        sub_mats = matlist[loci]
        index = indices[loci]
        width = index[0, 1]
        full_mat = np.zeros((width, width))
        for sub, pos in zip(sub_mats, index):
            i, j = pos[-2], pos[-1]
            s = sub
            if corp > 0:
                s = s[:, corp:-corp, corp:-corp]
            _, h, w = s.shape
            full_mat[i : i + h, j : j + w] = s
        key = except_chr[species][num] if num in except_chr[species] and isinstance(n, str) else n
        results[n] = full_mat
    return results


def pooling(mat, scale, pool_type="max", return_array=False, verbose=False):
    """Average/max pooling (io.py:159-175), numpy reshape-based."""
    m = np.asarray(mat, dtype=np.float32)
    squeeze = m.ndim == 2
    if squeeze:
        m = m[None]
    c, h, w = m.shape
    hs, ws = h // scale * scale, w // scale * scale
    m = m[:, :hs, :ws].reshape(c, hs // scale, scale, ws // scale, scale)
    if pool_type == "avg":
        out = m.mean(axis=(2, 4))
    else:
        out = m.max(axis=(2, 4))
    if return_array:
        return out.squeeze()
    return out


def dense2sparse(mat_path, key, low_range, up_range):
    """npz -> [bin1, bin2, value] triplet list over a range (io.py:177-203)."""
    x = np.load(mat_path)
    y = np.array(x[key])
    z = y[low_range:up_range, low_range:up_range]
    h, w = z.shape
    assert h == w
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack(
        [(ii + low_range).ravel(), (jj + low_range).ravel(), z.ravel()], axis=1
    )


def reference_regions(mat_path, key, chromosome, resolution):
    """Per-bin genomic regions (io.py:206-238)."""
    x = np.load(mat_path)
    num_bins = np.array(x[key]).shape[0]
    out = {}
    for i in range(num_bins + 1):
        out[i] = [chromosome, i * resolution, (i + 1) * resolution]
    return out


def get_region(region_dict, up_range, low_range):
    return [
        v for v in region_dict.values() if low_range <= int(v[2]) <= up_range
    ]
