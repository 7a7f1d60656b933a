#!/usr/bin/env python
"""HiCDiff training CLI — reference-compatible flags (-u/-b/-e/-l/-n/-s).

Re-design of /root/reference/train.py. Semantics preserved:
  * `-u 1` ("unsupervised") trains the UNCONDITIONAL DDPM on clean targets;
    `-u 0` trains the conditional DDPM with the noisy patch as conditioning
    channel. (The reference's internal naming is inverted — condition=True selects
    the unconditional engine, train.py:86-107 — we keep the CLI contract and fix
    the flag parsing: the reference's `type=bool` made ANY string truthy,
    SURVEY.md quirk #1.)
  * hicedrn backbone, T=1000, L2 loss, linear beta schedule, Adam lr=2e-5,
    best/final checkpoints in Model_Weights/ (train.py:92-190).
  * Human cells use the single-cell (99.99-percentile) data module like the
    reference's `_sing` import (train.py:14-17,75-77).

New: data-parallel over all TPU chips (jax.sharding mesh), JSONL logging, seeded
noise caches, optional bf16 compute.
"""
import argparse
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
from hicdiff_tpu.train.logging import MetricLogger
from hicdiff_tpu.train.trainer import Trainer


def create_parser():
    parser = argparse.ArgumentParser(
        description="HiCDiff works for single-cell HI-C data denoising !!!"
    )
    parser.add_argument(
        "-u", "--unspervised", type=int, default=1, choices=[0, 1],
        help="1: unsupervised/unconditional DDPM; 0: supervised/conditional DDPM",
    )
    parser.add_argument("-b", "--batch_size", type=int, default=64)
    parser.add_argument("-e", "--epoch", type=int, default=400)
    parser.add_argument("-l", "--celline", type=str, default="Human",
                        choices=["Human", "Dros"])
    parser.add_argument("-n", "--celln", type=int, default=1)
    parser.add_argument("-s", "--sigma", type=float, default=1.0,
                        help="Gaussian noise level in [0, 1]")
    parser.add_argument("--root", type=str, default=None,
                        help="data/checkpoint root (default: repo dir)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute (fp32 params)")
    parser.add_argument("--timestep", type=int, default=1000)
    parser.add_argument("--schedule", type=str, default="linear")
    parser.add_argument("--blocks", type=int, default=32,
                        help="hicedrn residual blocks (reference: 32)")
    parser.add_argument("--features", type=int, default=256,
                        help="hicedrn feature width (reference: 256)")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume params/opt_state/step from "
                             "(new capability: the reference cannot resume)")
    parser.add_argument("--ckpt-throttle", type=float, default=0.0,
                        help="min seconds between best-checkpoint writes "
                             "(each write fetches all params from the device; "
                             "the true best is always written at the end)")
    parser.add_argument("--ema-decay", type=float, default=0.0,
                        help="exponential-moving-average decay for the params "
                             "(0 disables; saved in checkpoints, consumed by "
                             "inference.py --use-ema). The reference has no EMA")
    return parser.parse_args()


class HiCDiff:
    """train.py:44-107 parity wrapper."""

    def __init__(self, epoch=500, timestep=1000, cell_Line="Human", cellNo=1,
                 res=40000, batch_size=64, piece_s=64, sigma=0.1, condition=True,
                 deg="deno", root=None, seed=0, bf16=False, schedule="linear",
                 blocks=32, features=256, ema_decay=0.0, ckpt_throttle=0.0):
        self.epoch = epoch
        self.ema_decay = ema_decay
        self.ckpt_throttle = ckpt_throttle
        self.cell_line = cell_Line
        self.cell_no = cellNo
        self.res = res
        self.chunk = piece_s
        self.seed = seed
        # stored into the checkpoint payload: the reference filename carries
        # no sigma/deg, so retrains at other noise levels share the name —
        # loaders warn via warn_run_config_mismatch
        self.run_config = dict(sigma=sigma, deg=deg, schedule=schedule,
                               timestep=timestep)
        root = root or os.path.dirname(os.path.abspath(__file__))
        self.out_dir = os.path.join(root, "Model_Weights")
        os.makedirs(self.out_dir, exist_ok=True)

        # reference uses the single-cell (_sing) modules for training
        factory = GSE130711Module if cell_Line == "Human" else GSE131811Module
        dm = factory(
            single_cell=True, batch_size=batch_size, res=res, piece_size=piece_s,
            cell_No=cellNo, sigma_0=sigma, deg=deg, root=root,
        )
        dm.prepare_data()
        dm.setup(stage="fit")
        # record the normalization scale the weights are trained at, so
        # serving (serve.py denoise_mcool) can clip at the same percentile
        self.run_config["percentile"] = float(dm.percentile)
        self.train_loader = dm.train_dataloader()
        self.val_loader = dm.val_dataloader()

        dtype = jnp.bfloat16 if bf16 else None
        # inverted-naming parity: condition=True -> UNconditional engine
        if not condition:
            model = HicedrnDiff(self_condition=True, dtype=dtype,
                                number_resnet=blocks, features=features)
            mode = "cond"
        else:
            model = HicedrnDiff(dtype=dtype, number_resnet=blocks,
                                features=features)
            mode = "uncond"
        self.engine = GaussianDiffusion.create(
            model,
            image_size=piece_s,
            timesteps=timestep,
            loss_type="l2",
            beta_schedule=schedule,
            auto_normalize=False,
            mode=mode,
        )
        self.tag = (
            f"HiCedrn_{'cond_' if mode == 'cond' else ''}l2_{schedule[:3]}"
        )
        self.logger = MetricLogger(
            out_path=os.path.join(
                root, "logs",
                f"train_{self.tag}_cell{cellNo}_s{sigma}.jsonl",
            ),  # sigma in the name: runs at different noise levels share a tag
            run_name=f"hicedrn_Diff_{mode}_L2_{schedule} cell_{cellNo}",
        )

    def fit_model(self, resume: str = None):
        trainer = Trainer(self.engine, lr=2e-5, mesh=make_mesh(),
                          ema_decay=self.ema_decay)
        rng = jax.random.PRNGKey(self.seed)
        params, opt_state = trainer.init(rng)
        start_step = 0
        if resume:
            from hicdiff_tpu.train.checkpoint import load_checkpoint

            ck = load_checkpoint(
                resume, like={"params": jax.device_get(params),
                              "opt_state": jax.device_get(opt_state), "step": 0}
            )
            params, opt_state, start_step = ck["params"], ck["opt_state"], ck["step"]
            print(f"resumed from {resume} at step {start_step}")
        return trainer.fit(
            params,
            opt_state,
            self.train_loader,
            self.val_loader,
            epochs=self.epoch,
            rng=jax.random.fold_in(rng, 1),
            logger=self.logger,
            ckpt_dir=self.out_dir,
            ckpt_tag=self.tag,
            ckpt_meta=dict(
                res=self.res, chunk=self.chunk,
                cell_line=self.cell_line, cell_no=self.cell_no,
            ),
            start_step=start_step,
            ckpt_throttle_s=self.ckpt_throttle,
            run_config=dict(mode=self.engine.mode, **self.run_config),
        )


if __name__ == "__main__":
    args = create_parser()
    train_model = HiCDiff(
        epoch=args.epoch,
        timestep=args.timestep,
        batch_size=args.batch_size,
        cellNo=args.celln,
        cell_Line=args.celline,
        sigma=args.sigma,
        condition=bool(args.unspervised),
        root=args.root,
        seed=args.seed,
        bf16=args.bf16,
        schedule=args.schedule,
        blocks=args.blocks,
        features=args.features,
        ema_decay=args.ema_decay,
        ckpt_throttle=args.ckpt_throttle,
    )
    train_model.fit_model(resume=args.resume)
    print("Training is done !!! ~~~~~")
