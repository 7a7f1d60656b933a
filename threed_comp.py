#!/usr/bin/env python
"""3D chromosome-structure comparison driver.

Re-design of /root/reference/pretrain/3DComp_diff.py: consume a saved
Outputs_diff/{target,noisy,predict,inds}.npy quartet, threshold-rescale, export
per-64-bin-block upper-triangle constraint files + 3DMax parameter files, then
(optionally, when java + 3DMax.jar are available) reconstruct structures and
report pairwise TM-score/RMSD between the target / noisy / predict ensembles.

Without java the pipeline stops after the parameter files (the expensive model
outputs are already on disk for any 3DMax-equipped machine to pick up) — the
reference instead `git clone`s 3DMax at runtime, impossible in a zero-egress
environment (PARITY.md #21).
"""
import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hicdiff_tpu.analysis.structure3d import (
    build_parameters,
    pairwise_tm_scores,
    run_3dmax,
    threshold_rescale,
    write_constraints,
)
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outputs_dir", help="an Outputs_diff/<run>/ directory")
    ap.add_argument("--workdir", default="3D_Mod")
    ap.add_argument("--jar", default="other_tools/examples/3DMax.jar")
    ap.add_argument("--max-blocks", type=int, default=8,
                    help="cap on exported blocks per source")
    ap.add_argument("--threshold", type=float, default=0.3)
    args = ap.parse_args()

    arrays = {}
    for name in ("target", "noisy", "predict", "inds"):
        arrays[name] = np.load(os.path.join(args.outputs_dir, f"{name}.npy"))
    inds = arrays.pop("inds")

    cons_dir = os.path.join(args.workdir, "Constraints")
    out_dir = os.path.join(args.workdir, "output")
    os.makedirs(cons_dir, exist_ok=True)

    # diagonal blocks only (|i-j|==0 patches follow the chromosome diagonal;
    # the reference exports every ~2.56Mb block, 3DComp_diff.py:253+)
    written = {}
    for name, arr in arrays.items():
        # [-1,1] -> [0,1] then small-value rescale (factor 2 for targets,
        # 3 otherwise — 3DComp.py:180-207)
        factor = 2.0 if name == "target" else 3.0
        count = 0
        for idx in range(arr.shape[0]):
            if count >= args.max_blocks:
                break
            # host-side rescale [-1,1] -> [0,1]; jnp here would dispatch one
            # remote-TPU op per patch
            mat = np.clip((arr[idx, 0] + 1.0) / 2.0, 0.0, 1.0)
            # keep only diagonal-looking blocks: strong main diagonal
            if np.mean(np.abs(np.diag(mat))) < 1e-6:
                continue
            mat = threshold_rescale(mat, args.threshold, factor)
            chro = int(inds[idx]) if idx < len(inds) else 0
            path = os.path.join(
                cons_dir, f"chro_{chro}_{name}_{count}_"
            )
            write_constraints(mat, path)
            count += 1
        written[name] = count
        print(f"{name}: {count} constraint blocks")

    params = build_parameters(
        os.path.join(cons_dir, "chro_*"),
        os.path.join(args.workdir, "Parameters"),
        out_dir,
    )
    print(f"{len(params)} 3DMax parameter files -> {args.workdir}/Parameters")

    if shutil.which("java") and os.path.exists(args.jar):
        os.makedirs(out_dir, exist_ok=True)
        run_3dmax(params, args.jar)
        for a, b in (("predict", "target"), ("noisy", "target")):
            pa = sorted(glob.glob(os.path.join(out_dir, f"*_{a}_*.pdb")))
            pb = sorted(glob.glob(os.path.join(out_dir, f"*_{b}_*.pdb")))
            scores = pairwise_tm_scores(pa, pb)
            if scores:
                tms = [s[0] for s in scores.values()]
                print(f"TM({a} vs {b}): mean={np.mean(tms):.4f} n={len(tms)}")
    else:
        print("java/3DMax.jar not available — stopped after parameter export "
              f"(jar expected at {args.jar})")


if __name__ == "__main__":
    main()
