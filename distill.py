#!/usr/bin/env python
"""Progressive distillation CLI: compress the truncated conditional sampler.

New capability beyond the reference (which always runs the full T=1000
ancestral chain, /root/reference/src/hicdiff_condition.py:601-623). Starting
from a trained conditional checkpoint (train.py -u 0), repeatedly halves the
truncated DDIM chain (t*+1 steps at --t-start auto; 30 -> 15 -> 8 -> 4 -> 2
-> 1 at sigma=0.1 on sigmoid) via hicdiff_tpu/train/distill.py.

Each stage writes Model_Weights/bestg_..._{tag}_dist{K}.msgpack; evaluate any
stage through the standard inference path (the student's training grid is
bitwise the sampler's grid):

    python inference.py -u 0 --t-start auto --sampling-steps K \
        --weights Model_Weights/bestg_..._dist{K}.msgpack
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from hicdiff_tpu.data.datamodule import GSE130711Module, GSE131811Module
from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.hicedrn import HicedrnDiff
from hicdiff_tpu.parallel.mesh import make_mesh
from hicdiff_tpu.train.checkpoint import (
    checkpoint_name,
    load_checkpoint,
    save_checkpoint,
    warn_run_config_mismatch,
)
from hicdiff_tpu.train.distill import ProgressiveDistiller, halving_stages
from hicdiff_tpu.train.logging import MetricLogger


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-b", "--batch_size", type=int, default=16)
    ap.add_argument("-l", "--celline", type=str, default="Human",
                    choices=["Human", "Dros"])
    ap.add_argument("-n", "--celln", type=int, default=1)
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--schedule", type=str, default="sigmoid")
    ap.add_argument("--teacher", type=str, default=None,
                    help="teacher checkpoint (default: the conventional "
                         "conditional name for this schedule/cell)")
    ap.add_argument("--use-ema", action="store_true",
                    help="start from the teacher's EMA params")
    ap.add_argument("--stages", type=str, default=None,
                    help="comma list of student step counts, e.g. '15,8,4,2,1' "
                         "(default: halvings of t*+1 down to 1)")
    ap.add_argument("--steps-per-stage", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    root = args.root or os.path.dirname(os.path.abspath(__file__))
    ckpt_dir = os.path.join(root, "Model_Weights")

    factory = GSE130711Module if args.celline == "Human" else GSE131811Module
    dm = factory(
        single_cell=True, batch_size=args.batch_size, res=40000, piece_size=64,
        cell_No=args.celln, sigma_0=args.sigma, deg="deno", root=root,
    )
    dm.prepare_data()
    dm.setup(stage="fit")

    dtype = jnp.bfloat16 if args.bf16 else None
    model = HicedrnDiff(self_condition=True, dtype=dtype)
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=args.timestep, loss_type="l2",
        beta_schedule=args.schedule, mode="cond",
    )
    t_star = engine.truncation_timestep(args.sigma)
    engine = dataclasses.replace(engine, t_start=t_star)

    base_tag = f"HiCedrn_cond_l2_{args.schedule[:3]}"
    meta = dict(res=40000, chunk=64, cell_line=args.celline, cell_no=args.celln)
    teacher_path = args.teacher or os.path.join(
        ckpt_dir, checkpoint_name("bestg", tag=base_tag, **meta)
    )
    ck = load_checkpoint(teacher_path)
    warn_run_config_mismatch(
        ck, dict(sigma=args.sigma, schedule=args.schedule, mode="cond",
                 timestep=args.timestep), teacher_path,
    )
    params = (
        ck["ema_params"] if args.use_ema and ck.get("ema_params") else ck["params"]
    )
    print(f"teacher: {teacher_path}  t*={t_star} "
          f"(K0={t_star + 1} truncated steps)")

    if args.stages:
        stages = [int(x) for x in args.stages.split(",")]
    else:
        stages = halving_stages(t_star + 1)[1:]  # students only

    mesh = make_mesh()
    logger = MetricLogger(
        out_path=os.path.join(
            root, "logs", f"distill_{base_tag}_cell{args.celln}_s{args.sigma}.jsonl"
        ),
        run_name=f"distill {base_tag} s{args.sigma}",
    )
    rng = jax.random.PRNGKey(args.seed)
    for k in stages:
        distiller = ProgressiveDistiller(engine, student_steps=k, lr=args.lr,
                                         mesh=mesh)
        params, best_val = distiller.fit(
            params,
            dm.train_dataloader(),
            dm.val_dataloader(),
            steps=args.steps_per_stage,
            rng=jax.random.fold_in(rng, k),
            logger=logger,
        )
        out = os.path.join(
            ckpt_dir, checkpoint_name("bestg", tag=f"{base_tag}_dist{k}", **meta)
        )
        save_checkpoint(
            out, params, step=args.steps_per_stage,
            run_config=dict(sigma=args.sigma, schedule=args.schedule,
                            mode="cond", timestep=args.timestep,
                            distilled_steps=k),
        )
        print(f"stage K={k}: val distill loss {best_val:.6f} -> {out}")
    print("Distillation is done !!!")


if __name__ == "__main__":
    main()
