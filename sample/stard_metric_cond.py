#!/usr/bin/env python
"""Conditional-diffusion evaluation driver (sample/stard_metric_cond.py parity):
loads the conditional checkpoint and runs the full reverse chain + metrics via
the shared inference path (timestep 1000, sigmoid schedule — the working config
at stard_metric_cond.py:44-73)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference import Inference

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--celln", type=int, default=1)
    ap.add_argument("-l", "--celline", type=str, default="Human")
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    Inference(
        cellNo=args.celln, cell_Line=args.celline, sigma_t=args.sigma,
        condition=False, root=args.root, schedule="sigmoid",
        timestep=args.timestep, weights=args.weights, bf16=args.bf16,
    )
