"""Attach the latent (pre-Poisson) ground truth to a saved Outputs_diff quartet.

Why: the full-scale synthetic cell (tools/make_fullscale_fixture.py) draws
every contact count from a Poisson rate lam(i, j). The realized counts carry
irreducible per-contact speckle, so on pointwise metrics (MSE/PSNR) no
denoiser can beat the identity baseline against the REALIZED target — the
MSE-optimal output is the smooth band expectation, which is exactly lam
(VALIDATION.md, full-scale honest notes). The reference has no counterpart:
its evaluators only ever score against realized data
(/root/reference/src/Utils/stard_metrics.py:148-182).

This tool rebuilds lam on the quartet's own [-1, 1] scale and writes it as
`latent.npy` (NCHW, aligned with the quartet's patch order), so
tools/quartet_metrics.py can score predict / noisy / realized-target against
the true underlying signal:

  python tools/make_fullscale_fixture.py <mcool> --latent-dir <ldir>   # same seed
  python tools/latent_target.py --quartet-dir Outputs_diff/<run> \
      --datafull-dir DataFull/DataFull_... --mcool <mcool> --latent-dir <ldir>
  python tools/quartet_metrics.py --dir Outputs_diff/<run> --target-file latent.npy

Scale correctness: the latent is balanced with the SAME mcool weights, row-
dropped with the SAME removeidx, and clipped/scaled with the SAME percentile
value as the observed matrix the prep pipeline normalized
(hicdiff_tpu/data/preprocess.py normalize_matrix_stats /
apply_normalize_stats), so latent and realized target live on the identical
[-1, 1] scale and differ only by the generator's sampling noise.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hicdiff_tpu.data.fastio import load_coo_txt
from hicdiff_tpu.data.mcool import McoolFile
from hicdiff_tpu.data.preprocess import (
    apply_normalize_stats,
    coo_to_dense,
    normalize_matrix_stats,
    split_pieces,
)

__all__ = ["latent_pieces_for_chrom", "build_latent_npy"]


def _observed_stats(constraints_dir: str, chro: int, res: int, percentile: float):
    """Replay the prep pipeline's normalization of the OBSERVED matrix
    (load_both_constraints semantics, preprocess.py:91-107) and return the
    bin range + normalization statistics it used."""
    a = load_coo_txt(os.path.join(constraints_dir, f"chrom_{chro}_{res}.txt"))
    b = load_coo_txt(os.path.join(constraints_dir, f"chrom_{chro}_count.txt"))
    rows = np.concatenate([a[:, 0], a[:, 1], b[:, 0], b[:, 1]]) / res
    bigbin, smallbin = int(rows.max()), int(rows.min())
    mata, _, _ = coo_to_dense(
        a[:, 0], a[:, 1], a[:, 2], res, smallbin=smallbin, bigbin=bigbin
    )
    _, removeidx, per = normalize_matrix_stats(mata, percentile)
    return smallbin, bigbin, removeidx, per


def _latent_dense(lam_band: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """(n, band) latent rates + per-bin balancing weights -> symmetric dense
    balanced latent matrix (NaN weights -> 0, like the observed path's
    fillna(0) — those rows are removed by the shared removeidx anyway)."""
    n, band = lam_band.shape
    w = np.nan_to_num(weights, nan=0.0)
    dense = np.zeros((n, n), np.float32)
    for d in range(band):
        m = n - d
        if m <= 0:
            break
        i = np.arange(m)
        vals = lam_band[:m, d] * w[i] * w[i + d]
        dense[i, i + d] = vals
        dense[i + d, i] = vals
    return dense


def latent_pieces_for_chrom(
    latent_dir: str,
    constraints_dir: str,
    mc: McoolFile,
    chro: int,
    res: int,
    percentile: float,
    piece_size: int = 64,
) -> np.ndarray:
    """Latent band patches of one chromosome on the observed quartet's exact
    [-1, 1] scale, in split_pieces order — aligned 1:1 with the prep
    pipeline's `full` (target) pieces."""
    lam_band = np.load(os.path.join(latent_dir, f"latent_chr{chro}.npy"))
    smallbin, bigbin, removeidx, per = _observed_stats(
        constraints_dir, chro, res, percentile
    )
    weights = mc.weights(mc.chromnames[chro - 1])
    if lam_band.shape[0] != weights.shape[0] or lam_band.shape[0] <= bigbin:
        raise ValueError(
            f"chr{chro}: latent has {lam_band.shape[0]} bins but the fixture "
            f"has {weights.shape[0]} (observed range ..{bigbin}) — latent_dir "
            "was generated with a different seed/bin table than this fixture"
        )
    lam_band = lam_band[smallbin : bigbin + 1]
    weights = weights[smallbin : bigbin + 1]
    dense = _latent_dense(lam_band, weights)
    norm = np.float32(apply_normalize_stats(dense, removeidx, per))
    return split_pieces(norm, piece_size, piece_size, resol=res)


def build_latent_npy(
    quartet_dir: str,
    datafull_dir: str,
    mcool: str,
    latent_dir: str,
    res: int = 40000,
    percentile: float = 99.0,
    piece_size: int = 64,
) -> dict:
    """Write `<quartet_dir>/latent.npy` aligned with the quartet's inds."""
    inds = np.load(os.path.join(quartet_dir, "inds.npy"))
    target = np.load(os.path.join(quartet_dir, "target.npy"))
    constraints_dir = os.path.join(datafull_dir, "Constraints")
    mc = McoolFile(mcool, res)

    # chromosome order = order of first appearance in inds (the dataset's
    # concatenation order: setup('all') ascending, setup('test') split order)
    chros = list(dict.fromkeys(int(c) for c in inds))
    parts = []
    for c in chros:
        pieces = latent_pieces_for_chrom(
            latent_dir, constraints_dir, mc, c, res, percentile, piece_size
        )
        n_expect = int((inds == c).sum())
        if pieces.shape[0] != n_expect:
            raise ValueError(
                f"chr{c}: latent yields {pieces.shape[0]} pieces but the "
                f"quartet has {n_expect} — latent_dir/seed does not match "
                "the fixture this quartet was computed from"
            )
        parts.append(pieces)
    latent = np.concatenate(parts).astype(np.float32)
    if latent.shape != target.shape:
        raise ValueError(f"latent {latent.shape} vs target {target.shape}")
    np.save(os.path.join(quartet_dir, "latent"), latent)

    flat_l, flat_t = latent.ravel(), target.ravel()
    corr = float(np.corrcoef(flat_l, flat_t)[0, 1])
    return {
        "quartet_dir": quartet_dir,
        "n_patches": int(latent.shape[0]),
        "chromosomes": chros,
        "corr_latent_target": round(corr, 4),
        "speckle_rms": round(float(np.sqrt(np.mean((flat_l - flat_t) ** 2))), 5),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--quartet-dir", required=True)
    ap.add_argument("--datafull-dir", required=True,
                    help="DataFull_... cache dir (its Constraints/ txts "
                         "drive the replayed normalization statistics)")
    ap.add_argument("--mcool", required=True,
                    help="the fixture .mcool (balancing weights source)")
    ap.add_argument("--latent-dir", required=True,
                    help="latent_chr{i}.npy dir from make_fullscale_fixture "
                         "--latent-dir (same seed as the fixture)")
    ap.add_argument("--res", type=int, default=40000)
    ap.add_argument("--percentile", type=float, default=99.0,
                    help="99.0 population cells (1/22), 99.99 single cells — "
                         "must match the prep that produced the quartet")
    args = ap.parse_args()
    info = build_latent_npy(
        args.quartet_dir, args.datafull_dir, args.mcool, args.latent_dir,
        res=args.res, percentile=args.percentile,
    )
    print(json.dumps(info))


if __name__ == "__main__":
    main()
