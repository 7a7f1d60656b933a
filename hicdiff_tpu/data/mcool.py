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
        self._bin1_offset_cache = None
        with h5py.File(path, "r") as f:
            grp = self._group(f)
            # cooler >= 0.8 declares its pixel storage mode; everything below
            # (bin1_offset slicing, upper-triangle symmetrization in
            # coo_to_dense) assumes the schema's symmetric-upper layout, so a
            # declared 'square' cooler must fail loudly, not read half its
            # data (cooler schema v3; PrepareData_linear.py:140-158 gets the
            # same guarantee from cooler.matrix())
            mode = grp.attrs.get("storage-mode", "symmetric-upper")
            mode = mode.decode() if isinstance(mode, bytes) else str(mode)
            if mode != "symmetric-upper":
                raise ValueError(
                    f"{path} declares storage-mode={mode!r}; this reader "
                    "(like the reference's balance=True fetch path) supports "
                    "only 'symmetric-upper' coolers"
                )
            self.chromnames = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in grp["chroms/name"][:]
            ]
            self.chromsizes = grp["chroms/length"][:].astype(np.int64)
            self._chrom_offset = self._load_chrom_offset(grp)
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

    def _load_chrom_offset(self, grp) -> np.ndarray:
        """indexes/chrom_offset when present, else rebuilt from the bins
        table (the indexes/ group is an optional acceleration structure in
        the cooler schema; files written by some tools omit it)."""
        if "indexes" in grp and "chrom_offset" in grp["indexes"]:
            return grp["indexes/chrom_offset"][:].astype(np.int64)
        chrom_of_bin = grp["bins/chrom"][:]
        if chrom_of_bin.dtype.kind in ("S", "U", "O"):  # names, not codes
            names = [
                c.decode() if isinstance(c, bytes) else str(c)
                for c in chrom_of_bin
            ]
            code = {n: i for i, n in enumerate(self.chromnames)}
            chrom_of_bin = np.asarray([code[n] for n in names], np.int64)
        # bins are ordered by chromosome per the schema; offsets by binary
        # search over the (sorted) code vector
        return np.searchsorted(
            np.asarray(chrom_of_bin, np.int64),
            np.arange(len(self.chromnames) + 1),
        ).astype(np.int64)

    def _chrom_index(self, chrom: str) -> int:
        """Name lookup tolerant of the UCSC-vs-Ensembl 'chr' prefix split:
        real coolers ship both 'chr1' (UCSC/hg19) and '1' (Ensembl/GRCh)
        naming; the pipeline always asks in 'chr{N}' form
        (PrepareData_linear.py:141)."""
        if chrom in self.chromnames:
            return self.chromnames.index(chrom)
        alt = chrom[3:] if chrom.startswith("chr") else "chr" + chrom
        if alt in self.chromnames:
            return self.chromnames.index(alt)
        raise KeyError(
            f"chromosome {chrom!r} not in {self.path} "
            f"(names: {self.chromnames[:8]}{'...' if len(self.chromnames) > 8 else ''})"
        )

    def _group(self, f):
        if "resolutions" in f:
            return f[f"resolutions/{self.resolution}"]
        return f

    def n_bins(self, chrom: str) -> int:
        ci = self._chrom_index(chrom)
        return int(self._chrom_offset[ci + 1] - self._chrom_offset[ci])

    def weights(self, chrom: str) -> np.ndarray:
        """Balancing weight vector of one chromosome's bins (NaN = masked bin,
        exactly as stored — callers decide the fill)."""
        ci = self._chrom_index(chrom)
        return self._weights[self._chrom_offset[ci] : self._chrom_offset[ci + 1]]

    def _bin1_offset(self, grp, lo_bin: int, hi_bin: int):
        """(p_lo, p_hi) pixel range for bin1 in [lo_bin, hi_bin): the
        indexes/bin1_offset CSR index when present, else a one-time
        searchsorted over pixels/bin1_id (sorted per schema), cached."""
        if "indexes" in grp and "bin1_offset" in grp["indexes"]:
            bin1_offset = grp["indexes/bin1_offset"]
            return int(bin1_offset[lo_bin]), int(bin1_offset[hi_bin])
        if self._bin1_offset_cache is None:
            bin1_all = grp["pixels/bin1_id"][:].astype(np.int64)
            n_bins_total = int(self._chrom_offset[-1])
            self._bin1_offset_cache = np.searchsorted(
                bin1_all, np.arange(n_bins_total + 1)
            ).astype(np.int64)
        return (
            int(self._bin1_offset_cache[lo_bin]),
            int(self._bin1_offset_cache[hi_bin]),
        )

    def fetch(self, chrom: str) -> ChromPixels:
        """All intra-chromosomal pixels of `chrom` with balanced values.

        balanced[i] = count[i] * weight[bin1] * weight[bin2]; NaN -> 0.
        """
        ci = self._chrom_index(chrom)
        lo_bin = int(self._chrom_offset[ci])
        hi_bin = int(self._chrom_offset[ci + 1])

        with h5py.File(self.path, "r") as f:
            grp = self._group(f)
            p_lo, p_hi = self._bin1_offset(grp, lo_bin, hi_bin)
            bin1 = grp["pixels/bin1_id"][p_lo:p_hi].astype(np.int64)
            bin2 = grp["pixels/bin2_id"][p_lo:p_hi].astype(np.int64)
            count = grp["pixels/count"][p_lo:p_hi].astype(np.float64)

        if bin2.size and (bin2 < bin1).any():
            raise ValueError(
                f"{self.path} stores lower-triangle pixels for {chrom}; the "
                "symmetric-upper schema this reader (and the downstream "
                "upper-triangle symmetrization, preprocess.coo_to_dense) "
                "assumes stores i <= j only"
            )
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
