#!/usr/bin/env python
"""Per-experiment training CLI — one parameterized driver replacing the nine
clone scripts under /root/reference/pretrain/ (SURVEY.md §2.1):

  reference script                      equivalent invocation
  train_hicedrn_Diff.py            -->  --model hicedrn      --engine uncond --data pure_noise
  train_hicedrn_cond_Diff.py       -->  --model hicedrn      --engine cond   --data linear
  train_hicedrn_cond_Diff_n.py     -->  --model hicedrn      --engine cond   --data linear_sing
  train_hicedrn_Diff_sr3.py        -->  --model hicedrn_sr3  --engine sr3    --data linear
  train_unet_Diff.py               -->  --model unet         --engine uncond --data pure_noise
  train_unet_uncond.py             -->  --model unet         --engine uncond --data linear
  train_unet_Diff_cond.py          -->  --model unet         --engine cond   --data linear
  train_unet_Diff_cond_n.py        -->  --model unet         --engine cond   --data linear_sing
  train_unet_Diff_sr3.py           -->  --model unet_sr3     --engine sr3    --data linear

Plus --model hicedrn_att for the attention variant (hicedrn_att_Diff.py).
All runs: Adam lr 2e-5, L2, T=1000 linear schedule, best/final checkpoints.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from hicdiff_tpu.data.datamodule import HiCDataModule
from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.models.zoo import DIFFUSION_BACKBONES as MODELS
from hicdiff_tpu.parallel.mesh import make_mesh
from hicdiff_tpu.train.logging import MetricLogger
from hicdiff_tpu.train.trainer import Trainer


def main():
    ap = argparse.ArgumentParser(description="HiCDiff per-experiment pretraining")
    ap.add_argument("--model", choices=sorted(MODELS), default="hicedrn")
    ap.add_argument("--engine", choices=["uncond", "cond", "sr3"], default="cond")
    ap.add_argument("--data", choices=["linear", "linear_sing", "pure_noise"],
                    default="linear")
    ap.add_argument("-b", "--batch_size", type=int, default=64)
    ap.add_argument("-e", "--epoch", type=int, default=400)
    ap.add_argument("-l", "--celline", type=str, default="Human",
                    choices=["Human", "Dros"])
    ap.add_argument("-n", "--celln", type=int, default=1)
    ap.add_argument("-s", "--sigma", type=float, default=0.1)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--schedule", type=str, default="linear")
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--ckpt-throttle", type=float, default=60.0,
                    help="min seconds between best-checkpoint writes (each "
                         "write fetches all params through the remote "
                         "tunnel; early training improves every epoch, so "
                         "unthrottled writes dominate wall-clock — measured "
                         "~25 of 37 min on the 107M-param unet_sr3). The "
                         "running best stays on device and the true best is "
                         "always written at the end of fit; this only "
                         "affects mid-run crash recovery. 0 = reference "
                         "behavior (write every new best)")
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint to resume params/opt_state/step from "
                         "(same capability as train.py --resume; the "
                         "reference pretrain scripts cannot resume)")
    ap.add_argument("--sr3-per-sample-t", action="store_true",
                    help="sr3 engine only: draw the continuous noise level "
                         "per SAMPLE instead of the reference's one scalar t "
                         "per optimizer step (hicdiff_sr3.py:758) — b-times "
                         "denser t-space coverage; see VALIDATION.md")
    args = ap.parse_args()

    root = args.root or os.path.dirname(os.path.abspath(__file__))
    dtype = jnp.bfloat16 if args.bf16 else None

    percentile = 99.99 if args.data == "linear_sing" else None
    variant = "pure_noise" if args.data == "pure_noise" else "linear"
    dm = HiCDataModule(
        batch_size=args.batch_size, cell_line=args.celline, cell_No=args.celln,
        sigma_0=args.sigma, deg="deno", percentile=percentile, variant=variant,
        root=root, timestep=args.timestep, beta_schedule=args.schedule,
    )
    dm.prepare_data()
    dm.setup("fit")

    self_cond = args.engine in ("cond", "sr3")
    model = MODELS[args.model](self_cond, dtype)
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=args.timestep, loss_type="l2",
        beta_schedule=args.schedule, mode=args.engine,
        sr3_per_sample_t=args.sr3_per_sample_t,
    )
    tag = f"{args.model}_{args.engine}_{args.data}_l2_{args.schedule[:3]}"
    logger = MetricLogger(
        out_path=os.path.join(root, "logs", f"pretrain_{tag}_cell{args.celln}.jsonl"),
        run_name=f"{tag} cell_{args.celln}",
    )
    trainer = Trainer(engine, lr=2e-5, mesh=make_mesh())
    rng = jax.random.PRNGKey(args.seed)
    params, opt_state = trainer.init(rng)
    start_step = 0
    if args.resume:
        from hicdiff_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(
            args.resume, like={"params": jax.device_get(params),
                               "opt_state": jax.device_get(opt_state),
                               "step": 0},
        )
        params, opt_state, start_step = ck["params"], ck["opt_state"], ck["step"]
        print(f"resumed from {args.resume} at step {start_step}")
    trainer.fit(
        params, opt_state, dm.train_dataloader(), dm.val_dataloader(),
        epochs=args.epoch, rng=jax.random.fold_in(rng, 1), logger=logger,
        start_step=start_step, ckpt_throttle_s=args.ckpt_throttle,
        ckpt_dir=os.path.join(root, "Model_Weights"), ckpt_tag=tag,
        ckpt_meta=dict(res=dm.res, chunk=64, cell_line=args.celline,
                       cell_no=args.celln),
        run_config=dict(sigma=args.sigma, schedule=args.schedule,
                        mode=args.engine, timestep=args.timestep),
    )
    print("Pretraining is done !!!")


if __name__ == "__main__":
    main()
