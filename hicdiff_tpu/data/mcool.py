"""Native .mcool/.cool reader built directly on h5py.

The reference depends on the `cooler` package (PrepareData_linear.py:140-158:
`cooler.Cooler(path::resolutions/res).matrix(balance=True, as_pixels=True,
join=True).fetch(chrom)`). This image has no cooler, and a framework should not
need it: a cooler file IS an HDF5 file with a documented schema
(groups: bins{chrom,start,end,weight}, chroms{name,length},
pixels{bin1_id,bin2_id,count}, indexes{chrom_offset,bin1_offset}).
This module implements the exact subset the pipeline uses — per-chromosome
intra-chromosomal pixel extraction with balanced weights — with vectorized numpy.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = ["list_coolers", "McoolFile", "ChromPixels"]


def list_coolers(path: str) -> List[str]:
    """List cooler group paths in an .mcool (cooler.fileops.list_coolers parity)."""
    if h5py is None:
        raise RuntimeError("h5py is required to read .mcool files")
    out = []
    with h5py.File(path, "r") as f:
        if "resolutions" in f:
            for res in sorted(f["resolutions"], key=lambda r: int(r)):
                out.append(f"/resolutions/{res}")
        elif "pixels" in f:
            out.append("/")
    return out


@dataclasses.dataclass
class ChromPixels:
    """Intra-chromosomal COO pixels of one chromosome.

    start1/start2 are genomic coordinates (bp) like the reference's joined
    `start1`/`start2` columns; `balanced` has NaN weights already filled with 0
    (reference: c2.fillna(0), PrepareData_linear.py:152).
    """

    start1: np.ndarray
    start2: np.ndarray
    count: np.ndarray
    balanced: np.ndarray


class McoolFile:
    """One resolution of an .mcool file.

    Usage: McoolFile(path, 40000).fetch('chr1') -> ChromPixels
    """

    def __init__(self, path: str, resolution: int):
        if h5py is None:
            raise RuntimeError("h5py is required to read .mcool files")
        self.path = path
        self.resolution = int(resolution)
        with h5py.File(path, "r") as f:
            grp = self._group(f)
            self.chromnames = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in grp["chroms/name"][:]
            ]
            self.chromsizes = grp["chroms/length"][:].astype(np.int64)
            self._chrom_offset = grp["indexes/chrom_offset"][:].astype(np.int64)
            self._bin_start = grp["bins/start"][:].astype(np.int64)
            if "weight" in grp["bins"]:
                self._weights = grp["bins/weight"][:].astype(np.float64)
            else:
                # the reference's cooler .matrix(balance=True) raises on an
                # unbalanced cooler — silently using weights of 1 would feed
                # raw counts downstream as if they were balanced
                raise ValueError(
                    f"{path} has no bins/weight column (unbalanced cooler); "
                    "run ICE balancing first — the pipeline consumes "
                    "balance=True matrices (PrepareData_linear.py:149)"
                )

    def _group(self, f):
        if "resolutions" in f:
            return f[f"resolutions/{self.resolution}"]
        return f

    def n_bins(self, chrom: str) -> int:
        ci = self.chromnames.index(chrom)
        return int(self._chrom_offset[ci + 1] - self._chrom_offset[ci])

    def weights(self, chrom: str) -> np.ndarray:
        """Balancing weight vector of one chromosome's bins (NaN = masked bin,
        exactly as stored — callers decide the fill)."""
        ci = self.chromnames.index(chrom)
        return self._weights[self._chrom_offset[ci] : self._chrom_offset[ci + 1]]

    def fetch(self, chrom: str) -> ChromPixels:
        """All intra-chromosomal pixels of `chrom` with balanced values.

        balanced[i] = count[i] * weight[bin1] * weight[bin2]; NaN -> 0.
        """
        ci = self.chromnames.index(chrom)
        lo_bin = int(self._chrom_offset[ci])
        hi_bin = int(self._chrom_offset[ci + 1])

        with h5py.File(self.path, "r") as f:
            grp = self._group(f)
            bin1_offset = grp["indexes/bin1_offset"]
            p_lo = int(bin1_offset[lo_bin])
            p_hi = int(bin1_offset[hi_bin])
            bin1 = grp["pixels/bin1_id"][p_lo:p_hi].astype(np.int64)
            bin2 = grp["pixels/bin2_id"][p_lo:p_hi].astype(np.int64)
            count = grp["pixels/count"][p_lo:p_hi].astype(np.float64)

        # keep intra-chromosomal pixels only (fetch(chrom) semantics)
        mask = (bin2 >= lo_bin) & (bin2 < hi_bin)
        bin1, bin2, count = bin1[mask], bin2[mask], count[mask]

        w = self._weights
        balanced = count * w[bin1] * w[bin2]
        balanced = np.nan_to_num(balanced, nan=0.0)

        return ChromPixels(
            start1=self._bin_start[bin1],
            start2=self._bin_start[bin2],
            count=count,
            balanced=balanced,
        )
