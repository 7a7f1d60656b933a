#!/usr/bin/env python
"""Export a flax HicedrnDiff checkpoint to the reference's torch state-dict.

The exact inverse of tools/convert_torch_checkpoint.py (same key map, HWIO ->
OIHW, Dense kernels transposed), so a model trained with this framework can be
loaded into the reference's `src/model/hicedrn_Diff.py:210` module — used by
tools/ddim_crosscheck.py to run the REFERENCE torch sampler with OUR trained
weights (VERDICT r2 item 1), and by reference users migrating back.

    python tools/export_torch_checkpoint.py Model_Weights/bestg_....msgpack \
        --out /tmp/bestg_....pytorch

Keys are emitted bare (`head.weight`, ...) for hicedrn_Diff.load_state_dict;
pass --diffusion-prefix to emit `model.`-prefixed keys matching the
reference's torch.save(GaussianDiffusion.state_dict()) layout (schedule
buffers are NOT emitted — load with strict=False or into the bare backbone).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_hicedrn_params(params: dict, prefix: str = "") -> dict:
    """flax HicedrnDiff params tree -> torch-layout numpy state dict."""

    sd = {}

    def conv(name, tree):
        k = np.asarray(tree["Conv_0"]["kernel"])  # (kh, kw, in, out) HWIO
        sd[prefix + name + ".weight"] = np.ascontiguousarray(
            k.transpose(3, 2, 0, 1)
        )
        sd[prefix + name + ".bias"] = np.asarray(tree["Conv_0"]["bias"])

    def dense(name, tree):
        w = np.asarray(tree["Dense_0"]["kernel"])  # (in, out)
        sd[prefix + name + ".weight"] = np.ascontiguousarray(w.T)
        sd[prefix + name + ".bias"] = np.asarray(tree["Dense_0"]["bias"])

    conv("head", params["Conv2d_0"])
    conv("body_tail", params["Conv2d_1"])
    conv("tail", params["Conv2d_2"])
    dense("time_mlp.1", params["TimeMLP_0"]["Dense_0"])
    dense("time_mlp.3", params["TimeMLP_0"]["Dense_1"])
    i = 0
    while f"HicedrnResBlock_{i}" in params:
        blk = params[f"HicedrnResBlock_{i}"]
        conv(f"body.{i}.conv.proj", blk["Conv2d_0"])
        dense(f"body.{i}.mlp.1", blk["Dense_0"])
        i += 1
    if i == 0:
        raise ValueError("not a HicedrnDiff params tree (no HicedrnResBlock_*)")
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".msgpack checkpoint (this framework)")
    ap.add_argument("--out", required=True, help="output .pytorch path")
    ap.add_argument("--use-ema", action="store_true",
                    help="export the EMA weights if present")
    ap.add_argument("--diffusion-prefix", action="store_true",
                    help="prefix keys with 'model.' (GaussianDiffusion layout)")
    args = ap.parse_args()

    import torch

    from hicdiff_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(args.checkpoint)
    params = (
        ck["ema_params"] if args.use_ema and ck.get("ema_params") else ck["params"]
    )
    sd = export_hicedrn_params(
        params, prefix="model." if args.diffusion_prefix else ""
    )
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    n = sum(int(v.size) for v in sd.values())
    print(f"exported {args.checkpoint} -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
