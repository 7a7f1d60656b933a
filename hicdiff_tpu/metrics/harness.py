"""Evaluation harnesses: the three VisionMetrics flavors.

Re-designs of /root/reference/src/Utils/metrics_cond.py (conditional diffusion),
metrics_diff.py (unconditional + DDRM), and stard_metrics.py (plain baselines with
the full metric computation). All three preserve the Outputs_diff npy-quartet
contract {target, noisy, predict, inds} (saved NCHW, like the reference caches) and
the output directory naming, and ALL of them compute the full metric suite (the
reference's cond/diff harnesses declare accumulators but never fill them —
SURVEY.md §2.6; here the metrics are real).

The model callables are batched jax functions; batches are padded/sharded over the
device mesh by the caller (see cli/inference.py) — the harness itself is
mesh-agnostic.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.data.datamodule import GSE130711Module, GSE131811Module
from hicdiff_tpu.metrics.genomedisco import compute_reproducibility
from hicdiff_tpu.metrics.image import (
    inverse_data_transform,
    mse,
    pearson,
    psnr,
    snr,
    spearman,
    ssim,
)

__all__ = ["build_test_module", "evaluate_model", "MetricAccumulator"]


def build_test_module(
    cell_line: str, cellN: int, deg: str, sigma: float, *, root=None, batch_size=64,
    n_chroms=None, percentile=None,
):
    """Module choice by cell number: cells {1,22} population percentile, {2..6}
    single-cell (metrics_cond.py:67-77).

    percentile: explicit clip percentile override. The reference has a silent
    TRAIN/EVAL MISMATCH for cells 1/22: train.py always preps with the
    single-cell 99.99 module (train.py:14-17) while metrics_cond evaluates
    them with the population 99.0 module — invisible when the two clip values
    nearly coincide (narrow-band data), but a normalization-scale break on
    band-rich data (seen at full scale in round 5: eval SSIM 0.17 vs 0.60
    purely from the mismatch). Callers that know the training percentile
    (inference.py reads it from the checkpoint run_config, like serve.py's
    denoise_mcool) pass it here; None keeps reference behavior."""
    factory = GSE130711Module if cell_line == "Human" else GSE131811Module
    single = cellN in (2, 3, 4, 5, 6)
    kw = {} if percentile is None else {"percentile": float(percentile)}
    return factory(
        single_cell=single,
        batch_size=batch_size,
        deg=deg,
        sigma_0=sigma,
        cell_No=cellN,
        root=root,
        n_chroms=n_chroms,
        **kw,
    )


class MetricAccumulator:
    """The reference's running metric bookkeeping (stard_metrics.py:105-235).

    quirk_compat=True replicates the reference exactly: batch_{ssims,psnrs,pccs,
    spcs,snrs} append the RUNNING averages (so the final mean is a mean of running
    means) and 'snr' accumulates unnormalized. quirk_compat=False reports plain
    sample-weighted means.
    """

    def __init__(self, quirk_compat: bool = True, gds_skip_empty: bool = False):
        """gds_skip_empty=True skips GenomeDISCO on patches whose TARGET is
        empty (a per-patch guard; the reference's guard tests the whole
        batch sum, stard_metrics.py:175, so empty far-band patches score a
        hard -1 against any not-exactly-zero prediction and dominate the mean
        on sparse fixtures). Default False = reference parity."""
        self.quirk = quirk_compat
        self.gds_skip_empty = gds_skip_empty
        self.n = 0
        self.sums = {k: 0.0 for k in ["mse", "ssims", "pccs", "spcs", "snrs"]}
        self.batch_lists = {
            k: [] for k in ["ssim", "psnr", "mse", "snr", "pcc", "spc", "gds"]
        }

    def update(self, out01: np.ndarray, hr01: np.ndarray):
        """out01/hr01: NHWC batches already transformed to [0,1].

        Pinned to the host CPU backend: these are many tiny ops on small arrays,
        and dispatching each to a (possibly remote) TPU costs far more than the
        math itself.
        """
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            return self._update(out01, hr01)

    def _update(self, out01: np.ndarray, hr01: np.ndarray):
        bsz = out01.shape[0]
        self.n += bsz
        batch_mse = float(mse(out01, hr01))
        self.sums["mse"] += batch_mse * bsz
        self.sums["ssims"] += float(ssim(out01, hr01)) * bsz
        self.sums["snrs"] += float(snr(hr01, out01)) * bsz
        self.sums["pccs"] += float(pearson(out01, hr01)) * bsz
        self.sums["spcs"] += spearman(out01, hr01) * bsz

        run_psnr = 10 * np.log10(1.0 / (self.sums["mse"] / self.n))
        run_ssim = self.sums["ssims"] / self.n
        run_pcc = self.sums["pccs"] / self.n
        run_spc = self.sums["spcs"] / self.n
        run_snr = self.sums["snrs"] if self.quirk else self.sums["snrs"] / self.n

        self.batch_lists["ssim"].append(run_ssim)
        self.batch_lists["psnr"].append(run_psnr)
        self.batch_lists["mse"].append(batch_mse)
        self.batch_lists["snr"].append(run_snr)
        self.batch_lists["pcc"].append(run_pcc)
        self.batch_lists["spc"].append(run_spc)

        for i in range(bsz):
            if self.gds_skip_empty:
                if hr01[i].sum() == 0:  # no signal to reproduce in this patch
                    continue
            elif hr01.sum() == 0:  # reference parity: batch-level guard
                continue
            self.batch_lists["gds"].append(
                compute_reproducibility(
                    np.asarray(out01[i, :, :, 0]),
                    np.asarray(hr01[i, :, :, 0]),
                    transition=True,
                )
            )

    def result(self) -> Dict[str, float]:
        out = {}
        for k, v in self.batch_lists.items():
            out[f"pas_{k}"] = float(np.mean(v)) if v else float("nan")
        return out


def evaluate_model(
    model_fn: Callable[[np.ndarray], np.ndarray],
    *,
    model_name: str = "HiCdiff",
    chro="test",
    deg: str = "deno",
    sigma: float = 0.1,
    cellN: int = 1,
    cell_line: str = "Human",
    root: Optional[str] = None,
    out_root: Optional[str] = None,
    result_tag: str = "",
    batch_size: int = 64,
    n_chroms=None,
    quirk_compat: bool = True,
    compute_metrics: bool = True,
    pad_to: int = 1,
    input_kind: str = "noisy",  # 'noisy' (lr) for cond; 'sample' (y) for DDRM
    percentile=None,  # training-time clip percentile (see build_test_module)
) -> Dict:
    """Shared harness driver: iterate the test split, run `model_fn` per batch,
    save the Outputs_diff quartet, return {'predict', 'metrics', 'outdir'}.

    model_fn maps an NHWC [-1,1] input batch -> NHWC prediction batch. For the
    DDRM path pass input_kind='sample' to feed the measurement y (metrics_diff.py
    feeds `sp`, :172-180).
    """
    # HICDIFF_EVAL_TIMING=1 prints a phase breakdown (data setup / per-batch
    # dispatch+fetch / metric suite / npy save) — the reference has no timing
    # surface at all (SURVEY §5 tracing: none); on the tunneled backend this
    # is the tool for telling device time from host/tunnel overhead.
    timing = bool(int(os.environ.get("HICDIFF_EVAL_TIMING", "0") or "0"))
    t0 = time.perf_counter()
    dm = build_test_module(
        cell_line, cellN, deg, sigma, root=root, batch_size=batch_size,
        n_chroms=n_chroms, percentile=percentile,
    )
    dm.prepare_data()
    dm.setup(stage=chro)
    loader = dm.test_dataloader()
    if timing:
        print(f"[eval-timing] data setup: {time.perf_counter() - t0:.1f}s")

    out_root = out_root or os.path.join(root or os.getcwd(), "Outputs_diff")
    model_result = f"{model_name}{cell_line}{cellN}_{deg}_{sigma}{result_tag}"
    outdir = os.path.join(out_root, model_result)
    os.makedirs(outdir, exist_ok=True)

    acc = MetricAccumulator(quirk_compat=quirk_compat)
    prs, hrs, lrs, inds_all = [], [], [], []
    spent = {"dispatch": 0.0, "fetch": 0.0, "metrics": 0.0, "batches": 0}

    def dispatch(lr, hr, samp, inds):
        """Launch the model on a (padded) batch; defer the host fetch so the
        device runs batch N+1 while the host scores batch N."""
        bsz = lr.shape[0]
        x_in = lr if input_kind == "noisy" else samp
        if pad_to > 1 and bsz % pad_to:
            pad = pad_to - bsz % pad_to
            widths = [(0, pad)] + [(0, 0)] * (x_in.ndim - 1)
            x_in = np.pad(x_in, widths)
        t = time.perf_counter()
        out = model_fn(x_in)
        spent["dispatch"] += time.perf_counter() - t
        spent["batches"] += 1
        return out, bsz, hr, lr, inds

    def consume(pending):
        out, bsz, hr, lr, inds = pending
        t = time.perf_counter()
        out = np.asarray(out)[:bsz]
        spent["fetch"] += time.perf_counter() - t
        prs.append(out)
        hrs.append(hr)
        lrs.append(lr)
        inds_all.append(inds)
        if compute_metrics:
            # host-side rescale (inverse_data_transform 'rescaled' semantics)
            t = time.perf_counter()
            out01 = np.clip((out + 1.0) / 2.0, 0.0, 1.0)
            hr01 = np.clip((np.asarray(hr) + 1.0) / 2.0, 0.0, 1.0)
            acc.update(out01, hr01)
            spent["metrics"] += time.perf_counter() - t

    pending = None
    for batch in loader:
        nxt = dispatch(*batch)
        if pending is not None:
            consume(pending)
        pending = nxt
    if pending is not None:
        consume(pending)

    if timing:
        print(
            "[eval-timing] {batches} batches: dispatch {dispatch:.1f}s, "
            "fetch {fetch:.1f}s, metrics {metrics:.1f}s".format(**spent)
        )
        t0 = time.perf_counter()

    predict = np.concatenate(prs)
    target = np.concatenate(hrs)
    low = np.concatenate(lrs)
    index = np.concatenate(inds_all)

    # persist in the reference's NCHW layout (metrics_cond.py:126-134)
    to_nchw = lambda a: np.transpose(a, (0, 3, 1, 2)) if a.ndim == 4 else a
    np.save(os.path.join(outdir, "target"), to_nchw(target))
    np.save(os.path.join(outdir, "noisy"), to_nchw(low))
    np.save(os.path.join(outdir, "predict"), to_nchw(predict))
    np.save(os.path.join(outdir, "inds"), index)
    if timing:
        print(f"[eval-timing] concat+save: {time.perf_counter() - t0:.1f}s")

    return {
        "predict": predict,
        "inds": index,
        "metrics": acc.result() if compute_metrics else {},
        "outdir": outdir,
        "data_dir": dm.dirname,
        "res": dm.res,
    }
