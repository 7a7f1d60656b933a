#!/usr/bin/env python
"""Baseline evaluation driver — /root/reference/sample/stard_metric_normal.py
re-design: run the six baseline generators over the test split, compute
SSIM/PSNR/MSE/SNR/PCC/SPC/GenomeDISCO, write the Metrics/{...}.txt table.

Unlike the reference (which crashes at import because src/model/Hicarn.py is
missing — SURVEY.md quirk #6), every model here is runnable; models whose
checkpoints are absent are skipped with a notice. hicplus/hicsr get 6-pixel
input padding (stard_metrics.py:122-124).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
from hicdiff_tpu.metrics.harness import evaluate_model
from hicdiff_tpu.models.zoo import TABLE_BASELINES as MODELS
from hicdiff_tpu.models.zoo import baseline_checkpoint_path, load_baseline

METRIC_NAMES = ["ssim", "psnr", "mse", "snr", "pcc", "spc", "gds"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--celln", type=int, default=1)
    ap.add_argument("-l", "--celline", type=str, default="Human")
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--models", nargs="*", default=list(MODELS))
    ap.add_argument("--weights-dir", type=str, default=None)
    args = ap.parse_args()

    root = args.root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    wdir = args.weights_dir or os.path.join(root, "Model_Weights")
    deg, sigma = "deno", args.sigma

    results = {}
    rng = jax.random.PRNGKey(0)
    for name in args.models:
        model_fn, had = load_baseline(
            name, wdir=wdir, cell_line=args.celline, celln=args.celln,
            deg=deg, sigma=sigma, rng=rng,
        )
        if not had:
            ckpt = baseline_checkpoint_path(
                wdir, name, args.celline, args.celln, deg, sigma
            )
            print(f"[{name}] no checkpoint at {ckpt}; evaluating fresh init")
        print(name)
        res = evaluate_model(
            model_fn,
            model_name=name, chro="test", deg=deg, sigma=sigma,
            cellN=args.celln, cell_line=args.celline, root=root,
            result_tag="_normal",
        )
        results[name] = res["metrics"]

    # Metrics table (stard_metric_normal.py:140-161)
    gds_dir = os.path.join(root, "Metrics")
    os.makedirs(gds_dir, exist_ok=True)
    gds_path = f"{args.celline}{args.celln}_{deg}_{sigma}_normal"
    with open(os.path.join(gds_dir, gds_path + ".txt"), "a") as f:
        for name in args.models:
            f.write(f"\n{name}\n")
            for met in METRIC_NAMES:
                f.write(f"{met}:\t{results[name].get('pas_' + met, float('nan'))}\n")
    for name in args.models:
        print(name, {k: round(v, 4) for k, v in results[name].items()})


if __name__ == "__main__":
    main()
