#!/usr/bin/env python
"""Unconditional+DDRM evaluation driver (sample/stard_metric_diff.py parity):
the WORKING unconditional configuration — timestep=1000, linear schedule for the
DDRM betas (stard_metric_diff.py:36-69) — via the shared inference path."""
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
        condition=True, root=args.root, schedule="linear",
        timestep=args.timestep, weights=args.weights, bf16=args.bf16,
    )
