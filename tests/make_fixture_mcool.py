"""Synthetic .mcool fixture writer for golden tests (SURVEY.md §4: golden-file
tests for preprocessing on a tiny synthetic cooler)."""
import sys

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def make_fixture(
    path: str,
    bins_per_chrom=(48, 32),
    res: int = 40000,
    seed: int = 0,
    nan_weight_frac: float = 0.1,
):
    """Write a minimal but schema-correct single-resolution .mcool.

    Every chromosome gets a dense-ish diagonal band of Poisson counts so that the
    diagonal is mostly nonzero (the prep pipeline drops zero-diagonal rows).
    Returns (path, dict chrom->dense_balanced) for ground-truth checks.
    """
    rng = np.random.default_rng(seed)
    n_chroms = len(bins_per_chrom)
    names = [f"chr{i+1}" for i in range(n_chroms)]
    lengths = [n * res for n in bins_per_chrom]

    chrom_of_bin, start_of_bin = [], []
    for ci, n in enumerate(bins_per_chrom):
        chrom_of_bin += [ci] * n
        start_of_bin += list(np.arange(n) * res)
    n_bins = len(chrom_of_bin)
    chrom_of_bin = np.asarray(chrom_of_bin, np.int32)
    start_of_bin = np.asarray(start_of_bin, np.int64)
    end_of_bin = start_of_bin + res

    weights = rng.uniform(0.5, 1.5, size=n_bins)
    nan_idx = rng.choice(n_bins, int(nan_weight_frac * n_bins), replace=False)
    weights[nan_idx] = np.nan

    # build upper-triangle intra-chromosomal pixels with a diagonal band
    bin1, bin2, count = [], [], []
    offset = 0
    dense_truth = {}
    for ci, n in enumerate(bins_per_chrom):
        mat = np.zeros((n, n))
        for i in range(n):
            for j in range(i, min(i + 10, n)):
                lam = max(20 - 2 * (j - i), 1)
                c = rng.poisson(lam)
                if c > 0 or i == j:
                    c = max(c, 1 if i == j else c)
                    if c == 0:
                        continue
                    bin1.append(offset + i)
                    bin2.append(offset + j)
                    count.append(c)
                    w = weights[offset + i] * weights[offset + j]
                    v = 0.0 if np.isnan(w) else c * w
                    mat[i, j] = v
                    mat[j, i] = v
        dense_truth[names[ci]] = mat
        offset += n

    bin1 = np.asarray(bin1, np.int64)
    bin2 = np.asarray(bin2, np.int64)
    count = np.asarray(count, np.int32)
    order = np.lexsort((bin2, bin1))
    bin1, bin2, count = bin1[order], bin2[order], count[order]

    bin1_offset = np.searchsorted(bin1, np.arange(n_bins + 1))
    chrom_offset = np.concatenate([[0], np.cumsum(bins_per_chrom)]).astype(np.int64)

    with h5py.File(path, "w") as f:
        g = f.create_group(f"resolutions/{res}")
        g.create_dataset("chroms/name", data=np.array(names, dtype="S16"))
        g.create_dataset("chroms/length", data=np.asarray(lengths, np.int64))
        g.create_dataset("bins/chrom", data=chrom_of_bin)
        g.create_dataset("bins/start", data=start_of_bin)
        g.create_dataset("bins/end", data=end_of_bin)
        g.create_dataset("bins/weight", data=weights)
        g.create_dataset("pixels/bin1_id", data=bin1)
        g.create_dataset("pixels/bin2_id", data=bin2)
        g.create_dataset("pixels/count", data=count)
        g.create_dataset("indexes/bin1_offset", data=bin1_offset.astype(np.int64))
        g.create_dataset("indexes/chrom_offset", data=chrom_offset)
    return path, dense_truth


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixture.mcool"
    make_fixture(out)
    print(f"wrote {out}")
