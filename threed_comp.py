#!/usr/bin/env python
"""3D chromosome-structure comparison driver.

Two sources, covering BOTH reference flows:

  * quartet mode (default; /root/reference/pretrain/3DComp_diff.py): consume a
    saved Outputs_diff/{target,noisy,predict,inds}.npy quartet;
  * baseline mode (--baselines; /root/reference/pretrain/3DComp.py:96-175): run
    the six baseline generators (hiedsr/hicarn/deephic/hicsr/hicplus/unet) over
    the test patches of a data module and feed their outputs to the 3D
    pipeline alongside noisy/target.

Both: threshold-rescale (target x2, predictions x3 below 0.3 —
3DComp.py:183-207), export per-64-bin-block upper-triangle constraint files +
3DMax parameter files, then reconstruct structure ensembles and report
pairwise TM-score/RMSD between them. Reconstruction engines:

  * --engine native (default): the built-in TPU-native stress optimizer
    (hicdiff_tpu/analysis/reconstruct.py) — no external dependencies;
  * --engine 3dmax: shell out to `java -jar 3DMax.jar` exactly like the
    reference (which `git clone`s 3DMax at runtime, impossible in a
    zero-egress environment — PARITY.md #21; the jar path is a flag).

Every block is exported by default; any cap (--max-blocks) or filter
(--diagonal-only) logs exactly how many blocks it dropped.
"""
import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
from hicdiff_tpu.analysis.structure3d import (
    build_parameters,
    pairwise_tm_scores,
    run_3dmax,
    threshold_rescale,
    write_constraints,
)


def export_blocks(name, arr, inds, cons_dir, *, threshold, max_blocks,
                  diagonal_only):
    """Write constraint files for the blocks of one source array.

    arr: (N, 1, 64, 64) in [-1, 1] (cache layout) or (N, 64, 64, 1); factor 2
    for targets, 3 otherwise (3DComp.py:183-207). Returns (written, dropped).
    """
    factor = 2.0 if name == "target" else 3.0
    if arr.ndim == 4 and arr.shape[-1] == 1:  # NHWC -> N1HW view
        arr = np.transpose(arr, (0, 3, 1, 2))
    written = dropped = 0
    blocks = []
    for idx in range(arr.shape[0]):
        # host-side rescale [-1,1] -> [0,1]; jnp here would dispatch one
        # remote-TPU op per patch
        mat = np.clip((arr[idx, 0] + 1.0) / 2.0, 0.0, 1.0)
        if diagonal_only and np.mean(np.abs(np.diag(mat))) < 1e-6:
            dropped += 1
            continue
        if max_blocks and written >= max_blocks:
            dropped += 1
            continue
        mat = threshold_rescale(mat, threshold, factor)
        chro = int(inds[idx]) if idx < len(inds) else 0
        write_constraints(
            mat, os.path.join(cons_dir, f"chro_{chro}_{name}_{written}_")
        )
        blocks.append((f"chro_{chro}_{name}_{written}", mat))
        written += 1
    return written, dropped, blocks


def _per_block_tms(out_dir, source):
    """TM scores of `source` vs target ensembles, paired PER genomic block.

    The reference compares ensembles segment by segment
    (getSegmentTMScores globs chro_X_<src>_<idx>_*.pdb, 3DComp.py:389-404);
    an all-pairs comparison across different blocks would superpose
    structures of unrelated genomic regions.
    """
    import re

    def groups(name):
        pat = re.compile(rf"chro_(\d+)_{re.escape(name)}_(\d+)[_.]")
        out = {}
        for p in glob.glob(os.path.join(out_dir, f"chro_*_{name}_*.pdb")):
            m = pat.search(os.path.basename(p))
            if m:
                out.setdefault((m.group(1), m.group(2)), []).append(p)
        return out

    src, tgt = groups(source), groups("target")
    tms = []
    for key in sorted(src):
        if key not in tgt:
            continue
        scores = pairwise_tm_scores(sorted(src[key]), sorted(tgt[key]))
        tms.extend(s[0] for s in scores.values())
    return tms


def collect_baseline_arrays(args):
    """Run the six baselines over the test patches (3DComp.py:96-175)."""
    from hicdiff_tpu.metrics.harness import build_test_module
    from hicdiff_tpu.models.zoo import BASELINES, load_baseline

    root = args.root or os.path.dirname(os.path.abspath(__file__))
    # the same module-selection convention as every metric driver
    # (single_cell by cell number, metrics_cond.py:67-77)
    dm = build_test_module(
        args.celline, args.celln, "deno", args.sigma, root=root,
        batch_size=args.batch_size,
    )
    dm.prepare_data()
    stage = int(args.chro) if args.chro.isdigit() else args.chro
    dm.setup(stage=stage)
    loader = dm.test_dataloader()

    names = args.models
    model_fns = {}
    for name in names:
        fn, had = load_baseline(
            name, wdir=os.path.join(root, "Model_Weights"),
            cell_line=args.celline, celln=args.celln, sigma=args.sigma,
        )
        if not had:
            print(f"[{name}] no checkpoint; using fresh init "
                  "(reference weights come from the ScHiCEDRN project)")
        model_fns[name] = fn

    outs = {name: [] for name in names}
    noisy, target, all_inds = [], [], []
    for data, tgt, _, inds in loader:
        bsz = data.shape[0]
        x_in = data
        if bsz < args.batch_size:
            # pad the ragged final batch to the jitted shape — a new shape
            # would cost one fresh remote compile PER baseline (CLAUDE.md)
            widths = [(0, args.batch_size - bsz)] + [(0, 0)] * (data.ndim - 1)
            x_in = np.pad(data, widths)
        for name, fn in model_fns.items():
            outs[name].append(np.asarray(fn(x_in))[:bsz])
        noisy.append(data)
        target.append(tgt)
        all_inds.append(np.asarray(inds))
    arrays = {name: np.concatenate(v) for name, v in outs.items()}
    arrays["noisy"] = np.concatenate(noisy)
    arrays["target"] = np.concatenate(target)
    return arrays, np.concatenate(all_inds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outputs_dir", nargs="?", default=None,
                    help="an Outputs_diff/<run>/ directory (quartet mode)")
    ap.add_argument("--baselines", action="store_true",
                    help="run the six baseline models over test patches "
                         "instead of consuming a saved quartet (3DComp.py)")
    ap.add_argument("--models", nargs="*",
                    default=["hiedsr", "hicarn", "deephic", "hicsr", "unet",
                             "hicplus"])
    ap.add_argument("-n", "--celln", type=int, default=1)
    ap.add_argument("-l", "--celline", type=str, default="Human")
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("-b", "--batch_size", type=int, default=64)
    ap.add_argument("--chro", type=str, default="test",
                    help="baseline mode: data-module stage to evaluate")
    ap.add_argument("--quartet-chro", type=str, default="all",
                    help="quartet mode: restrict a saved quartet to one "
                         "chromosome number or the 'test' split via its inds "
                         "labels (default: all blocks)")
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--workdir", default="3D_Mod")
    ap.add_argument("--engine", choices=["native", "3dmax"], default="native",
                    help="structure engine: 'native' = TPU-native stress "
                         "optimizer (analysis/reconstruct.py, no external "
                         "deps); '3dmax' = shell out to java 3DMax.jar like "
                         "the reference")
    ap.add_argument("--num", type=int, default=3,
                    help="structures per block (3DMax NUM)")
    ap.add_argument("--convert-factor", type=float, default=0.6)
    ap.add_argument("--max-iter", type=int, default=2000)
    ap.add_argument("--jar", default="other_tools/examples/3DMax.jar")
    ap.add_argument("--max-blocks", type=int, default=0,
                    help="cap on exported blocks per source (0 = all)")
    ap.add_argument("--diagonal-only", action="store_true",
                    help="export only blocks on the chromosome diagonal")
    ap.add_argument("--threshold", type=float, default=0.3)
    args = ap.parse_args()

    if args.baselines:
        arrays, inds = collect_baseline_arrays(args)
    else:
        if not args.outputs_dir:
            sys.exit("quartet mode needs an Outputs_diff/<run>/ directory "
                     "(or pass --baselines)")
        arrays = {}
        for name in ("target", "noisy", "predict", "inds"):
            arrays[name] = np.load(
                os.path.join(args.outputs_dir, f"{name}.npy")
            )
        inds = arrays.pop("inds")
        # quartet filtering is opt-in (--chro is also baseline mode's data
        # stage, defaulted to 'test'; a default must not silently drop blocks
        # from a whole-cell quartet)
        if args.quartet_chro and args.quartet_chro != "all":
            # restrict a whole-cell quartet to one split/chromosome via its
            # saved inds labels (3DComp_diff.py consumes per-chromosome too);
            # 'test' = the test-split chromosomes of the cell line
            if args.quartet_chro == "test":
                from hicdiff_tpu.data.datamodule import (
                    DROS_SPLITS,
                    HUMAN_SPLITS,
                )

                splits = HUMAN_SPLITS if args.celline == "Human" else DROS_SPLITS
                want = set(splits["test"])
            else:
                want = {int(args.quartet_chro)}
            keep = np.isin(inds, sorted(want))
            if not keep.any():
                sys.exit(f"--quartet-chro {args.quartet_chro}: no quartet "
                         f"blocks on chromosomes {sorted(want)}")
            arrays = {k: v[keep] for k, v in arrays.items()}
            inds = inds[keep]
            print(f"--quartet-chro {args.quartet_chro}: "
                  f"{int(keep.sum())}/{keep.size} quartet patches kept")

    cons_dir = os.path.join(args.workdir, "Constraints")
    out_dir = os.path.join(args.workdir, "output")
    os.makedirs(cons_dir, exist_ok=True)

    n_blocks = 0
    for name, arr in arrays.items():
        written, dropped, blocks = export_blocks(
            name, arr, inds, cons_dir, threshold=args.threshold,
            max_blocks=args.max_blocks, diagonal_only=args.diagonal_only,
        )
        note = f" (DROPPED {dropped})" if dropped else ""
        print(f"{name}: {written} constraint blocks{note}")
        if args.engine == "native":
            # reconstruct per source as we go (a whole-run block list would
            # hold every rescaled matrix in memory; with 3dmax the jar reads
            # the constraint files instead)
            from hicdiff_tpu.analysis.reconstruct import reconstruct_to_pdbs

            os.makedirs(out_dir, exist_ok=True)
            for base, mat in blocks:
                reconstruct_to_pdbs(
                    mat, os.path.join(out_dir, base),
                    factor=args.convert_factor, num=args.num,
                    max_iter=args.max_iter,
                )
            n_blocks += len(blocks)

    params = build_parameters(
        os.path.join(cons_dir, "chro_*"),
        os.path.join(args.workdir, "Parameters"),
        out_dir,
        num=args.num,
        convert_factor=args.convert_factor,
        max_iteration=args.max_iter,
    )
    print(f"{len(params)} 3DMax parameter files -> {args.workdir}/Parameters")

    reconstructed = False
    if args.engine == "native":
        print(f"native engine: {n_blocks} blocks x {args.num} "
              f"structures -> {out_dir}")
        reconstructed = n_blocks > 0
    elif shutil.which("java") and os.path.exists(args.jar):
        os.makedirs(out_dir, exist_ok=True)
        run_3dmax(params, args.jar)
        reconstructed = True
    else:
        print("java/3DMax.jar not available — stopped after parameter export "
              f"(jar expected at {args.jar}); use --engine native for the "
              "built-in optimizer")

    if reconstructed:
        sources = [n for n in arrays if n != "target"]
        per_source = {}
        for a in sources:
            tms = _per_block_tms(out_dir, a)
            if tms:
                per_source[a] = tms
                print(f"TM({a} vs target): mean={np.mean(tms):.4f} "
                      f"n={len(tms)}")
        if per_source:
            tag = (
                "baselines" if args.baselines
                else os.path.basename(os.path.normpath(args.outputs_dir))
            )
            write_tm_report(per_source, args, tag)


def write_tm_report(per_source, args, tag):
    """Per-model TM table + distribution plot (the reference's result
    surface: pairwise TM tables and per-model box/scatter plots,
    3DComp.py:544-651 parallelScatter / getTMScores prints).

    Writes Metrics/3d_tm_scores_<tag>.txt (mean/std/median/min/max TM of each
    source's per-block reconstructions vs the target's) and a matching
    boxplot png.
    """
    root = args.root or os.path.dirname(os.path.abspath(__file__))
    mdir = os.path.join(root, "Metrics")
    os.makedirs(mdir, exist_ok=True)
    table = os.path.join(mdir, f"3d_tm_scores_{tag}.txt")
    order = sorted(per_source, key=lambda a: -float(np.mean(per_source[a])))
    with open(table, "w") as f:
        f.write(
            f"TM-score vs target | engine={args.engine} num={args.num} "
            f"max_iter={args.max_iter} factor={args.convert_factor} "
            f"cell={args.celline}{args.celln} sigma={args.sigma} "
            # the operative data filter: --chro stages baseline mode's data;
            # quartet mode filters blocks by --quartet-chro instead
            f"chro={args.chro if args.baselines else args.quartet_chro}\n"
        )
        f.write(f"{'source':<12}{'n':>6}{'mean':>9}{'std':>9}"
                f"{'median':>9}{'min':>9}{'max':>9}\n")
        for a in order:
            v = np.asarray(per_source[a])
            f.write(
                f"{a:<12}{len(v):>6}{v.mean():>9.4f}{v.std():>9.4f}"
                f"{np.median(v):>9.4f}{v.min():>9.4f}{v.max():>9.4f}\n"
            )
    print(f"TM table -> {table}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(1.2 * len(order) + 2, 4))
        ax.boxplot(
            [per_source[a] for a in order],
            tick_labels=order,
            showmeans=True,
            meanline=True,
            showfliers=False,
        )
        ax.set_ylabel("TM-score vs target (per block, all ensemble pairs)")
        ax.set_title(f"3D reconstruction agreement ({tag})")
        plt.setp(ax.get_xticklabels(), rotation=30, ha="right")
        fig.tight_layout()
        png = os.path.join(mdir, f"3d_tm_boxplot_{tag}.png")
        fig.savefig(png, dpi=120)
        plt.close(fig)
        print(f"TM boxplot -> {png}")
    except Exception as e:  # matplotlib is optional at runtime
        print(f"(no boxplot: {e})")


if __name__ == "__main__":
    main()
