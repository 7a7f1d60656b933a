#!/usr/bin/env python
"""HiCDiff inference CLI — reference-compatible flags (-u/-b/-n/-l/-s).

Re-design of /root/reference/inference.py. `-u 0` runs the conditional model's
full reverse `super_resolution` chain over the test split; `-u 1` runs the
unconditional model inside the DDRM restoration sampler. Both save the
Outputs_diff/{target,noisy,predict,inds}.npy quartet and (unlike the reference,
which declares but never computes them — SURVEY.md §2.6) report the full
SSIM/PSNR/MSE/SNR/PCC/SPC/GenomeDISCO suite.

Reference quirks handled:
  * `-u 1` set timestep=2000 against 1000 betas -> `range(0,1000,0)` crash
    (inference.py:55, metrics_diff.py:216-217). We default the uncond path to the
    working configuration timestep=1000 (sample/stard_metric_diff.py:36).
  * batch sharding over all TPU chips, batches padded to the device count.
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from hicdiff_tpu.data.datamodule import GSE130711Module, GSE131811Module
from hicdiff_tpu.degrade.operators import make_operator
from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.diffusion.schedules import get_beta_schedule
from hicdiff_tpu.metrics.harness import evaluate_model
from hicdiff_tpu.models.hicedrn import HicedrnDiff
from hicdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicate
from hicdiff_tpu.sampling.ddrm import ddrm_sample
from hicdiff_tpu.train.checkpoint import checkpoint_name, load_checkpoint


def create_parser():
    parser = argparse.ArgumentParser(
        description="HiCDiff works for single-cell HI-C data denoising !!!"
    )
    parser.add_argument("-u", "--unspervised", type=int, default=1, choices=[0, 1])
    parser.add_argument("-b", "--batch_size", type=int, default=64)
    parser.add_argument("-e", "--epoch", type=int, default=400)
    parser.add_argument("-l", "--celline", type=str, default="Human",
                        choices=["Human", "Dros"])
    parser.add_argument("-n", "--celln", type=int, default=1)
    parser.add_argument("-s", "--sigma", type=float, default=1.0)
    parser.add_argument("--root", type=str, default=None)
    parser.add_argument("--schedule", type=str, default="sigmoid",
                        help="beta schedule for the loaded model (inference.py:48)")
    parser.add_argument("--timestep", type=int, default=None,
                        help="diffusion T; default 1000")
    parser.add_argument("--sampling-steps", type=int, default=None,
                        help="DDIM fast path: use K < T sampling steps")
    parser.add_argument("--t-start", type=str, default=None,
                        help="truncated conditional sampling: start the "
                             "reverse chain at this timestep from the scaled "
                             "noisy input instead of pure noise at T-1. An "
                             "int, or 'auto' to derive the exact-marginal "
                             "timestep from sigma (alphas_cumprod[t] = "
                             "1/(1+sigma^2)). Conditional (-u 0) path only")
    parser.add_argument("--ddim-eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic, the "
                             "reference default; 1 = ancestral-like)")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--weights", type=str, default=None,
                        help="explicit checkpoint path (overrides convention)")
    parser.add_argument("--blocks", type=int, default=32)
    parser.add_argument("--features", type=int, default=256)
    parser.add_argument("--deg", type=str, default="deno",
                        help="degradation operator (deno/sr2/sr4/deblur_uni/"
                             "deblur_gauss/deblur_aniso/inp_mask/cs4/...)")
    parser.add_argument("--use-ema", action="store_true",
                        help="load the EMA weights from the checkpoint if present")
    parser.add_argument("--fused-resblock", action="store_true",
                        help="run the backbone through the Pallas fused "
                             "ResnetBlock kernel (base variant, conditional "
                             "path only)")
    parser.add_argument("--chro", type=str, default="test",
                        help="'test' (reference split), 'all' (full cell), or a "
                             "chromosome number")
    return parser.parse_args()


def Inference(batch_size=64, cellNo=1, cell_Line="Human", sigma_t=0.1,
              condition=None, root=None, schedule="sigmoid", timestep=None,
              bf16=False, seed=0, weights=None, sampling_steps=None,
              chro="test", deg="deno", use_ema=False, blocks=32, features=256,
              ddim_eta=0.0, fused_resblock=False, t_start=None):
    root = root or os.path.dirname(os.path.abspath(__file__))
    model_type = condition  # True -> unconditional/DDRM (reference naming)
    timestep = timestep or 1000
    dtype = jnp.bfloat16 if bf16 else None
    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = jax.random.PRNGKey(seed)

    if isinstance(chro, str) and chro.isdigit():
        chro = int(chro)

    # pretrained-weights convention (inference.py:92,103): cell_not=1, Human
    cell_not, cell_lint = 1, "Human"

    def resolve_weights(tags):
        """First existing checkpoint over (tag x cell-convention) candidates:
        the reference convention hard-codes Human1 for every run
        (inference.py:92,103); this repo's train.py stamps the actual cell —
        accept both so a train -> infer roundtrip needs no --weights flag."""
        cells = [(cell_lint, cell_not)]
        if (cell_Line, cellNo) not in cells:
            cells.append((cell_Line, cellNo))
        paths = [
            os.path.join(
                root, "Model_Weights",
                checkpoint_name("bestg", 40000, 64, cl, cn, tag),
            )
            for tag in tags
            for (cl, cn) in cells
        ]
        return next((p for p in paths if os.path.exists(p)), paths[0])

    if not model_type:
        # ---------------- conditional path: full reverse chain per batch
        model = HicedrnDiff(self_condition=True, dtype=dtype,
                            number_resnet=blocks, features=features)
        if fused_resblock:
            from hicdiff_tpu.models.fastpath import FusedHicedrn

            model = FusedHicedrn(model)
        engine = GaussianDiffusion.create(
            model, image_size=64, timesteps=timestep, loss_type="l2",
            beta_schedule=schedule, auto_normalize=False, mode="cond",
            sampling_timesteps=sampling_steps, ddim_sampling_eta=ddim_eta,
        )
        if t_start is not None and str(t_start) not in ("full", "none"):
            ts = (engine.truncation_timestep(max(sigma_t, 1e-4))
                  if str(t_start) == "auto" else int(t_start))
            engine = dataclasses.replace(engine, t_start=ts)
            print(f"truncated sampling: t_start={ts} "
                  f"({ts + 1} of {timestep} reverse steps)")
        elif sampling_steps and sampling_steps >= 170:
            print("note: conditional DDIM from pure noise measured unstable "
                  f"at K={sampling_steps} (degenerate for K>=170, "
                  "VALIDATION.md); prefer --t-start auto or K<=100")
        tag = f"HiCedrn_cond_l2_{schedule[:3]}"
        path = weights or resolve_weights([tag])
        ck = load_checkpoint(path)
        params = ck.get("ema_params") if use_ema and ck.get("ema_params") else ck["params"]
        params = replicate(mesh, params)
        sharding = data_sharding(mesh)

        # sharding is carried by the committed (device_put) inputs; explicit
        # in_shardings triggers a pathologically slow compile path on the
        # remote-compile TPU backend
        sr = jax.jit(lambda p, k, c: engine.super_resolution(p, k, c))

        batch_counter = [0]

        def model_fn(lr_batch):
            # return the device array — the harness defers the host fetch to
            # pipeline metric computation against the next batch's sampling.
            # fold the batch index so batches draw independent noise
            x = jax.device_put(jnp.asarray(lr_batch), sharding)
            key = jax.random.fold_in(rng, batch_counter[0])
            batch_counter[0] += 1
            return sr(params, key, x)

        result = evaluate_model(
            model_fn,
            model_name=f"hicedrn_l2_{schedule[:3]}",
            chro=chro, deg=deg, sigma=sigma_t, cellN=cellNo,
            cell_line=cell_Line, root=root, batch_size=batch_size,
            result_tag=f"_{chro}_cond", pad_to=batch_size, input_kind="noisy",
        )
    else:
        # ---------------- unconditional + DDRM restoration
        if t_start is not None and str(t_start) not in ("full", "none"):
            sys.exit("--t-start is a conditional-path (-u 0) feature; the "
                     "DDRM sampler already conditions on y via its spectral "
                     "init (use --sampling-steps to shorten the chain)")
        if fused_resblock:
            sys.exit("--fused-resblock currently applies to the conditional "
                     "(-u 0) backbone path")
        # DDRM drives the raw backbone directly (inference.py:108-109 passes
        # diffusion.model); the chain's betas come from get_beta_schedule below
        model = HicedrnDiff(self_condition=False, dtype=dtype,
                            number_resnet=blocks, features=features)
        # The reference's published uncond weights carry a `_trans` suffix
        # (inference.py:103, sample/stard_metric_diff.py), but this repo's own
        # train.py -u 1 writes the plain tag (train.py HiCDiff.tag) — accept
        # both so a train -> infer roundtrip needs no --weights flag
        # (PARITY.md #27).
        path = weights or resolve_weights([
            f"HiCedrn_l2_{schedule[:3]}_trans",
            f"HiCedrn_l2_{schedule[:3]}",
        ])
        ck = load_checkpoint(path)
        params = ck.get("ema_params") if use_ema and ck.get("ema_params") else ck["params"]
        params = replicate(mesh, params)
        sharding = data_sharding(mesh)
        betas = jnp.asarray(
            get_beta_schedule("linear", beta_start=0.0001, beta_end=0.02,
                              num_diffusion_timesteps=1000),
            jnp.float32,
        )
        h_funcs = make_operator(deg, image_channel=1, image_size=64)
        sigma_eff = max(sigma_t, 1e-4)  # sigma_0=0 divides in case A; guard
        inner = lambda x, t: model.apply({"params": params}, x, t, None)

        restore = jax.jit(
            lambda k, y: ddrm_sample(
                k, inner, h_funcs, y, sigma_eff, betas=betas,
                timestep=min(sampling_steps or timestep, 1000), num_timesteps=1000,
            )[0]
        )

        batch_counter = [0]

        def model_fn(samp_batch):
            y = jax.device_put(jnp.asarray(samp_batch), sharding)
            key = jax.random.fold_in(rng, 1_000 + batch_counter[0])
            batch_counter[0] += 1
            return restore(key, y)

        result = evaluate_model(
            model_fn,
            model_name=f"hicedrn_l2_{schedule[:3]}",
            chro=chro, deg=deg, sigma=sigma_t, cellN=cellNo,
            cell_line=cell_Line, root=root, batch_size=batch_size,
            result_tag=f"_trans2_{timestep}", pad_to=batch_size, input_kind="sample",
        )

    print("metrics:", result["metrics"])
    print("outputs:", result["outdir"])
    return result["predict"]


if __name__ == "__main__":
    args = create_parser()
    t0 = time.time()
    Out = Inference(
        batch_size=args.batch_size, cellNo=args.celln, cell_Line=args.celline,
        sigma_t=args.sigma, condition=bool(args.unspervised), root=args.root,
        schedule=args.schedule, timestep=args.timestep, bf16=args.bf16,
        seed=args.seed, weights=args.weights, sampling_steps=args.sampling_steps,
        chro=args.chro, deg=args.deg, use_ema=args.use_ema,
        blocks=args.blocks, features=args.features, ddim_eta=args.ddim_eta,
        fused_resblock=args.fused_resblock, t_start=args.t_start,
    )
    print(f"inference is done in {time.time()-t0:.1f}s, results saved !!!")
