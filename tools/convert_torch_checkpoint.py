#!/usr/bin/env python
"""Convert a reference HiCDiff .pytorch checkpoint to this framework's format.

The reference saves torch.save(GaussianDiffusion.state_dict()) — inner model
weights under 'model.*' plus the schedule buffers (betas, alphas_cumprod, ...,
train.py:182-190). This converter maps the hicedrn_Diff backbone weights
(src/model/hicedrn_Diff.py:210-289) onto this repo's flax parameter tree so a
user of the reference can load their trained models directly:

    python tools/convert_torch_checkpoint.py bestg_..._HiCedrn_cond_l2_sig.pytorch \
        --out Model_Weights/bestg_..._HiCedrn_cond_l2_sig.msgpack

Key mapping (torch -> flax):
    model.head.{weight,bias}            -> Conv2d_0/Conv_0        (OIHW -> HWIO)
    model.time_mlp.1.*                  -> TimeMLP_0/Dense_0/Dense_0  (transpose)
    model.time_mlp.3.*                  -> TimeMLP_0/Dense_1/Dense_0
    model.body.{i}.mlp.1.*              -> HicedrnResBlock_{i}/Dense_0/Dense_0
    model.body.{i}.conv.proj.*          -> HicedrnResBlock_{i}/Conv2d_0/Conv_0
    model.body_tail.*                   -> Conv2d_1/Conv_0
    model.tail.*                        -> Conv2d_2/Conv_0
Schedule buffers are dropped (schedules are reconstructed from config).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])  # (out, in, kh, kw)
    b = np.asarray(sd[prefix + ".bias"])
    return {"Conv_0": {"kernel": w.transpose(2, 3, 1, 0), "bias": b}}


def _dense(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])  # (out, in)
    b = np.asarray(sd[prefix + ".bias"])
    return {"Dense_0": {"kernel": w.T, "bias": b}}


def convert_hicedrn_state_dict(sd: dict) -> dict:
    """torch state dict (numpy values ok) -> flax params for HicedrnDiff."""
    # accept either the full GaussianDiffusion dict ('model.' prefixed) or the
    # bare backbone dict
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    n_blocks = 0
    while f"body.{n_blocks}.conv.proj.weight" in sd:
        n_blocks += 1
    if n_blocks == 0:
        raise ValueError(
            "not a hicedrn_Diff checkpoint (no body.{i}.conv.proj weights)"
        )

    params = {
        "Conv2d_0": _conv(sd, "head"),
        "Conv2d_1": _conv(sd, "body_tail"),
        "Conv2d_2": _conv(sd, "tail"),
        "TimeMLP_0": {
            "Dense_0": _dense(sd, "time_mlp.1"),
            "Dense_1": _dense(sd, "time_mlp.3"),
        },
    }
    for i in range(n_blocks):
        params[f"HicedrnResBlock_{i}"] = {
            "Conv2d_0": _conv(sd, f"body.{i}.conv.proj"),
            "Dense_0": _dense(sd, f"body.{i}.mlp.1"),
        }
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".pytorch file (torch.save'd state dict)")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()

    import torch

    from hicdiff_tpu.train.checkpoint import save_checkpoint

    sd = torch.load(args.checkpoint, map_location="cpu")
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params = convert_hicedrn_state_dict(sd)
    save_checkpoint(args.out, params)
    n = sum(int(np.prod(np.shape(v))) for v in _leaves(params))
    print(f"converted {args.checkpoint} -> {args.out} ({n:,} params)")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
