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
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.metrics.harness import evaluate_model
from hicdiff_tpu.models.baselines import (
    DeepHiC,
    HiCARN,
    HiCSR,
    HicPlus,
    Unet2D,
)
from hicdiff_tpu.models.hicedrn import HicedrnGenerator
from hicdiff_tpu.train.checkpoint import load_checkpoint

MODELS = {
    "hiedsr": (lambda: HicedrnGenerator(), False),
    "hicarn": (lambda: HiCARN(num_channels=64), False),
    "deephic": (lambda: DeepHiC(), False),
    "hicsr": (lambda: HiCSR(), True),  # needs 6-pad
    "unet": (lambda: Unet2D(), False),
    "hicplus": (lambda: HicPlus(), True),  # needs 6-pad
}
METRIC_NAMES = ["ssim", "psnr", "mse", "snr", "pcc", "spc", "gds"]


def make_model_fn(model, params, needs_pad):
    @jax.jit
    def fwd(x):
        return model.apply(params, x)

    def model_fn(lr_batch):
        x = jnp.asarray(lr_batch)
        if needs_pad:
            x = jnp.pad(x, ((0, 0), (6, 6), (6, 6), (0, 0)))
        return fwd(x)  # device array; harness defers the fetch

    return model_fn


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
        ctor, needs_pad = MODELS[name]
        model = ctor()
        ckpt = os.path.join(
            wdir,
            f"finalg_40000_c64_s64_{args.celline}{args.celln}_{deg}_{sigma}_{name}.msgpack",
        )
        # init first so BatchNorm models always have a batch_stats collection,
        # then overlay whatever the checkpoint provides (params only, or full
        # variables including batch_stats)
        x0 = jnp.zeros((1, 76 if needs_pad else 64, 76 if needs_pad else 64, 1))
        variables = dict(model.init(rng, x0))
        if os.path.exists(ckpt):
            loaded = load_checkpoint(ckpt)["params"]
            if isinstance(loaded, dict) and "params" in loaded:
                variables.update(loaded)  # full variables were saved
            else:
                variables["params"] = loaded
        else:
            print(f"[{name}] no checkpoint at {ckpt}; evaluating fresh init")
        print(name)
        res = evaluate_model(
            make_model_fn(model, variables, needs_pad),
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
