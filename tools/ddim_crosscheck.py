#!/usr/bin/env python
"""Cross-check the conditional-DDIM divergence against the torch reference.

VERDICT r2 item 1: the repo's conditional DDIM measurably degenerates at
K >= 170 sampling steps from pure noise (VALIDATION.md) and the divergence was
attributed to the model without ever running the REFERENCE sampler with the
SAME weights. This script settles it on CPU (fp32 both sides, zero TPU use):

  1. exports the trained flax checkpoint into the reference's torch
     `hicedrn_Diff` (tools/export_torch_checkpoint.py — the proven-to-2e-5
     weight mapping inverted);
  2. runs, from the IDENTICAL x_T and on the same fixture patch:
       * `jax`    — this repo's shipped ddim_sample (conditions on the noisy
         input every step, PARITY #26);
       * `torchB` — the same PARITY-#26 conditioning executed with the
         reference's torch model + the reference's DDIM update algebra
         (src/hicdiff_condition.py:640-660: clip_x_start=True
         model_predictions, x0*sqrt(a')+c*eps update) — the apples-to-apples
         probe of our sampler's dynamics;
       * `torchA` — the reference's OWN `ddim_sample` verbatim
         (src/hicdiff_condition.py:626-667: unconditional shape entry,
         running-x0 self-conditioning — the "has not been modified" sampler);
  3. records per-step trajectory stats + jax-vs-torchB divergence and final
     SSIM vs the clean target.

If torchB degenerates like jax (trajectories tracking each other), the
instability is a property of model+update, not an implementation bug.

Usage (background; ~8.5 s per model forward on this 1-core host):
    python tools/ddim_crosscheck.py --ks 170,250 --out _work/ddim_crosscheck
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # NEVER touch the (shared) TPU here

import jax.numpy as jnp

REF = "/root/reference"
DEFAULT_WEIGHTS = (
    "_work/ddim/Model_Weights/"
    "bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack"
)
DEFAULT_DATA = "_work/ddim/DataFull/DataFull_Human_cell1_40000_deno_0.1"


def load_patch(data_dir: str, chro: int = 2, idx: int = 0):
    """(noisy, target) NCHW fp32 single-patch batches from the Splits cache."""
    noisy = np.load(
        f"{data_dir}/Splits/GSE131811_noisy_chr_{chro}_40000_piece_64.npy"
    )[idx : idx + 1].astype(np.float32)
    full = np.load(
        f"{data_dir}/Splits/GSE131811_full_chr_{chro}_40000_piece_64.npy"
    )[idx : idx + 1].astype(np.float32)
    return noisy, full


def stats(a) -> dict:
    a = np.asarray(a, np.float64)
    return {
        "min": float(a.min()),
        "max": float(a.max()),
        "mean": float(a.mean()),
        "std": float(a.std()),
    }


def ssim01(a_nchw: np.ndarray, b_nchw: np.ndarray) -> float:
    from hicdiff_tpu.metrics.image import ssim

    to01 = lambda x: np.clip((x + 1.0) / 2.0, 0.0, 1.0)
    a = np.transpose(to01(a_nchw), (0, 2, 3, 1))
    b = np.transpose(to01(b_nchw), (0, 2, 3, 1))
    return float(ssim(jnp.asarray(a), jnp.asarray(b)))


def run_jax_trajectory(params, cond_nhwc, K, seed):
    """The shipped sampler, all timesteps returned: (K+1, 1, 64, 64, 1)."""
    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from hicdiff_tpu.models.hicedrn import HicedrnDiff

    model = HicedrnDiff(self_condition=True)
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=1000, loss_type="l2",
        beta_schedule="sigmoid", mode="cond", sampling_timesteps=K,
    )
    rng = jax.random.PRNGKey(seed)
    traj = engine.ddim_sample(
        params, rng, jnp.asarray(cond_nhwc), return_all_timesteps=True
    )
    return np.asarray(traj)


def jax_x_T(seed, shape):
    """Reproduce the shipped sampler's init: rng,init = split(key); N(init)."""
    keys = jax.random.split(jax.random.PRNGKey(seed))
    return np.asarray(jax.random.normal(keys[1], shape, dtype=jnp.float32))


def torch_modules(weights_path):
    import torch

    from hicdiff_tpu.train.checkpoint import load_checkpoint
    from tools.export_torch_checkpoint import export_hicedrn_params

    torch.set_num_threads(1)
    if REF not in sys.path:
        sys.path.append(REF)
    from src.hicdiff_condition import GaussianDiffusion as RefGD
    from src.model.hicedrn_Diff import hicedrn_Diff

    ck = load_checkpoint(weights_path)
    sd = export_hicedrn_params(ck["params"])
    model = hicedrn_Diff(self_condition=True)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    model.eval()
    return model, RefGD


def run_torch_b(model, RefGD, x_T_nchw, cond_nchw, K, log):
    """PARITY-#26 conditioning through the reference's model + DDIM algebra."""
    import torch

    diffusion = RefGD(
        model, image_size=64, timesteps=1000, sampling_timesteps=K,
        loss_type="l2", beta_schedule="sigmoid", auto_normalize=False,
    ).eval()
    # our time grid (gaussian.py ddim_sample; equals the reference's
    # torch.linspace(-1, 999, K+1).int() — asserted by the caller)
    times = np.linspace(-1, 999, K + 1).astype(int)[::-1]
    img = torch.from_numpy(x_T_nchw)
    cond = torch.from_numpy(cond_nchw)
    traj = [img.numpy().copy()]
    t0 = time.time()
    with torch.no_grad():
        for n, (tcur, tnext) in enumerate(zip(times[:-1], times[1:])):
            tb = torch.full((img.shape[0],), int(tcur), dtype=torch.long)
            pred_noise, x_start, *_ = diffusion.model_predictions(
                img, tb, cond, clip_x_start=True
            )
            if tnext < 0:
                img = x_start
            else:
                alpha = diffusion.alphas_cumprod[tcur]
                alpha_next = diffusion.alphas_cumprod[tnext]
                c = (1 - alpha_next).sqrt()  # eta = 0 -> sigma = 0
                img = x_start * alpha_next.sqrt() + c * pred_noise
            traj.append(img.numpy().copy())
            if (n + 1) % 10 == 0:
                log(
                    f"  torchB step {n+1}/{K} t={tcur} "
                    f"range [{float(img.min()):+.2f},{float(img.max()):+.2f}] "
                    f"({time.time()-t0:.0f}s)"
                )
    return np.stack(traj)


def run_torch_a(model, RefGD, x_T_nchw, K, log, patch_none_cond=False):
    """The reference's own ddim_sample, verbatim, with a pinned x_T.

    VERBATIM IT CRASHES: hicdiff_condition.py:640-642 passes
    self_cond=x_start which is None on the first iteration, and the
    self-conditioned hicedrn_Diff does torch.cat((None, x))
    (hicedrn_Diff.py:273) -> TypeError. patch_none_cond=True substitutes
    zeros for None (the upstream lucidrains default the reference stripped)
    so the running-x0 dynamics can still be probed.
    """
    import torch

    inner = model
    if patch_none_cond:
        class _NoneToZeros(torch.nn.Module):
            channels = 1
            out_dim = 1
            self_condition = True
            random_or_learned_sinusoidal_cond = False

            def __init__(self, m):
                super().__init__()
                self.m = m

            def forward(self, x, t, x_self_cond=None):
                if x_self_cond is None:
                    x_self_cond = torch.zeros_like(x)
                return self.m(x, t, x_self_cond)

        inner = _NoneToZeros(model)

    diffusion = RefGD(
        inner, image_size=64, timesteps=1000, sampling_timesteps=K,
        loss_type="l2", beta_schedule="sigmoid", auto_normalize=False,
    ).eval()
    want = tuple(x_T_nchw.shape)
    real_randn = torch.randn

    def pinned_randn(*args, **kwargs):
        shape = args[0] if isinstance(args[0], (tuple, list)) else args
        if tuple(shape) == want:
            return torch.from_numpy(x_T_nchw.copy())
        return real_randn(*args, **kwargs)

    t0 = time.time()
    torch.randn = pinned_randn
    try:
        with torch.no_grad():
            out = diffusion.ddim_sample(want, return_all_timesteps=False)
    finally:
        torch.randn = real_randn
    log(f"  torchA done in {time.time()-t0:.0f}s")
    return out.numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=DEFAULT_WEIGHTS)
    ap.add_argument("--data", default=DEFAULT_DATA)
    ap.add_argument("--ks", default="170,250")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chro", type=int, default=2)
    ap.add_argument("--skip-torch-a", action="store_true")
    ap.add_argument("--torch-a-ks", default=None,
                    help="comma list of K values to also run the reference's "
                         "own ddim_sample at (default: all of --ks); the "
                         "running-x0 probe costs another K forwards per K")
    ap.add_argument("--out", default="_work/ddim_crosscheck")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    logf = open(os.path.join(args.out, "log.txt"), "a")

    def log(msg):
        print(msg, flush=True)
        print(msg, file=logf, flush=True)

    from hicdiff_tpu.train.checkpoint import load_checkpoint

    noisy, target = load_patch(args.data, args.chro)
    cond_nhwc = np.transpose(noisy, (0, 2, 3, 1))
    params = load_checkpoint(args.weights)["params"]
    torch_model, RefGD = torch_modules(args.weights)

    # reference grid == our grid (torch truncates toward zero like astype(int))
    import torch as _torch

    for K in (int(k) for k in args.ks.split(",")):
        ours = np.linspace(-1, 999, K + 1).astype(int)
        refs = _torch.linspace(-1, 999, steps=K + 1).int().numpy()
        assert (ours == refs).all(), f"time grids differ at K={K}"

    results = {}
    for K in (int(k) for k in args.ks.split(",")):
        log(f"== K={K} ==")
        x_T = jax_x_T(args.seed, (1, 64, 64, 1))
        x_T_nchw = np.transpose(x_T, (0, 3, 1, 2)).copy()

        log(f"jax trajectory (K={K}) ...")
        t0 = time.time()
        jtraj = run_jax_trajectory(params, cond_nhwc, K, args.seed)
        log(f"  jax done in {time.time()-t0:.0f}s")

        btraj = run_torch_b(torch_model, RefGD, x_T_nchw, noisy, K, log)

        # per-step divergence jax vs torchB (both fp32, same x_T, eta=0)
        n = min(len(jtraj), len(btraj))
        diffs = [
            float(np.abs(np.transpose(jtraj[i, 0], (2, 0, 1)) - btraj[i, 0]).max())
            for i in range(n)
        ]
        step_stats = [
            {"step": i, "jax": stats(jtraj[i]), "torchB": stats(btraj[i]),
             "max_abs_diff": diffs[i]}
            for i in range(0, n, max(1, n // 20))
        ]
        final = {
            "jax": {**stats(jtraj[-1]),
                    "ssim_vs_target": ssim01(
                        np.transpose(jtraj[-1], (0, 3, 1, 2)), target)},
            "torchB": {**stats(btraj[-1]),
                       "ssim_vs_target": ssim01(btraj[-1], target)},
            "max_abs_diff_final": diffs[-1],
        }
        a_ks = (
            {int(k) for k in args.torch_a_ks.split(",")}
            if args.torch_a_ks
            else None
        )
        if not args.skip_torch_a and (a_ks is None or K in a_ks):
            try:
                a_out = run_torch_a(torch_model, RefGD, x_T_nchw, K, log)
                final["torchA"] = {**stats(a_out),
                                   "ssim_vs_target": ssim01(a_out, target)}
            except TypeError as e:
                final["torchA"] = {
                    "unrunnable_as_shipped": f"{type(e).__name__}: {e}",
                }
                log("  torchA verbatim crashes as shipped "
                    "(self_cond=None on first iteration); running "
                    "zeros-patched variant")
                a_out = run_torch_a(
                    torch_model, RefGD, x_T_nchw, K, log, patch_none_cond=True
                )
                final["torchA_zeros_patched"] = {
                    **stats(a_out), "ssim_vs_target": ssim01(a_out, target),
                }
        results[K] = {"steps": step_stats, "final": final}
        log(json.dumps({"K": K, "final": final}, indent=2))
        with open(os.path.join(args.out, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    log("crosscheck complete")


if __name__ == "__main__":
    main()
