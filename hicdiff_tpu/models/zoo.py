"""Baseline model registry + checkpoint-aware loader.

The reference instantiates the six baseline generators with hand-rolled
per-model blocks in both sample/stard_metric_normal.py:62-139 and
pretrain/3DComp.py:96-175 (weight files
`finalg_40000_c64_s64_{cell}{n}_{deg}_{sigma}_{model}.pytorch` trained by the
companion ScHiCEDRN project). This registry gives every driver one shared,
checkpoint-aware way to build a jitted forward for each baseline; hicplus and
hicsr consume 6-pixel-padded inputs (stard_metrics.py:122-124).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hicdiff_tpu.models.baselines import (
    DeepHiC,
    HiCARN,
    HiCSR,
    HicPlus,
    Unet2D,
)
from hicdiff_tpu.models.hicedrn import HicedrnDiff, HicedrnGenerator
from hicdiff_tpu.train.checkpoint import load_checkpoint

__all__ = [
    "BASELINES",
    "TABLE_BASELINES",
    "DIFFUSION_BACKBONES",
    "load_baseline",
    "baseline_checkpoint_path",
]


def _unet(sc, dt, noise_level_emb=False):
    from hicdiff_tpu.models.unet import Unet

    return Unet(
        dim=64, dim_mults=(1, 2, 4, 8), self_condition=sc,
        noise_level_emb=noise_level_emb, dtype=dt,
    )


# Diffusion backbones of the pretrain experiments (SURVEY.md §2.1: the nine
# pretrain/train_*.py clones span {hicedrn, hicedrn_att, hicedrn_sr3, unet,
# unet_sr3} x {uncond, cond, sr3}). name -> ctor(self_condition, dtype).
# Shared by pretrain.py (training) and inference.py --model (evaluation).
DIFFUSION_BACKBONES: Dict[str, Callable] = {
    "hicedrn": lambda sc, dt: HicedrnDiff(self_condition=sc, dtype=dt),
    "hicedrn_att": lambda sc, dt: HicedrnDiff(
        self_condition=sc, variant="att", dtype=dt
    ),
    "hicedrn_sr3": lambda sc, dt: HicedrnDiff(
        self_condition=sc, variant="sr3", dtype=dt
    ),
    "unet": lambda sc, dt: _unet(sc, dt),
    "unet_sr3": lambda sc, dt: _unet(sc, dt, noise_level_emb=True),
}

# name -> (constructor, needs_6px_pad, native output range).
#
# Output range ('pm1' = [-1,1], '01' = [0,1]): deephic ends in (tanh+1)/2,
# unet_2D in sigmoid, hicplus in relu — none can emit the negative half of the
# [-1,1] patch convention, so training them on [-1,1] targets collapses to the
# constant predictor (measured: identical MSE plateau for deephic/hicplus at
# 100 epochs). The reference never hits this because it only EVALUATES
# externally-trained ScHiCEDRN weights (stard_metric_normal.py:62-139) and
# applies inverse_data_transform('rescaled') to every output uniformly
# (stard_metrics.py:141-143). Our in-repo trainer fits '01' models in their
# native range and model_fn maps back to [-1,1], so every driver keeps
# speaking the one patch convention (PARITY.md #31).
BASELINES: Dict[str, Tuple[Callable, bool, str]] = {
    "hiedsr": (lambda: HicedrnGenerator(), False, "pm1"),
    "hicarn": (lambda: HiCARN(num_channels=64), False, "pm1"),
    "deephic": (lambda: DeepHiC(), False, "01"),
    "hicsr": (lambda: HiCSR(), True, "pm1"),
    "unet": (lambda: Unet2D(), False, "01"),
    "hicplus": (lambda: HicPlus(), True, "01"),
    # the adversarially-trained hiedsr (stard_metric_normal.py:74-79's
    # commented hiedsrgan block; trained via pretrain_baselines.py --models
    # hiedsrgan). Opt-in: not part of TABLE_BASELINES, the reference's
    # six-model table (stard_metric_normal.py:141).
    "hiedsrgan": (lambda: HicedrnGenerator(), False, "pm1"),
    # same generator trained with the BCE critic variant
    # (pretrain_baselines.py --disc-loss bce); separate checkpoint name so
    # the two objective decisions can be scored head-to-head
    "hiedsrgan_bce": (lambda: HicedrnGenerator(), False, "pm1"),
}

# the reference's canonical six-model evaluation set
TABLE_BASELINES = ["hiedsr", "hicarn", "deephic", "hicsr", "unet", "hicplus"]


def baseline_checkpoint_path(
    wdir: str, name: str, cell_line: str, celln: int, deg: str, sigma
) -> str:
    """Reference weight-file convention (3DComp.py:97-132)."""
    return os.path.join(
        wdir,
        f"finalg_40000_c64_s64_{cell_line}{celln}_{deg}_{sigma}_{name}.msgpack",
    )


def load_baseline(
    name: str,
    *,
    wdir: str,
    cell_line: str = "Human",
    celln: int = 1,
    deg: str = "deno",
    sigma=0.1,
    rng=None,
) -> Tuple[Callable, bool]:
    """Build (model_fn, had_checkpoint) for a named baseline.

    model_fn maps an NHWC (B, 64, 64, 1) [-1,1] numpy/jnp batch to a [-1,1]
    prediction batch (device array), applying the 6-pixel pad for
    hicplus/hicsr and the native-range adaptation for '01' models (input
    (x+1)/2, output 2*out-1 — see the BASELINES table note). Models are
    initialized first (so BatchNorm models always carry batch_stats) and any
    existing checkpoint is overlaid.
    """
    ctor, needs_pad, out_range = BASELINES[name]
    model = ctor()
    rng = jax.random.PRNGKey(0) if rng is None else rng
    size = 76 if needs_pad else 64
    variables = dict(model.init(rng, jnp.zeros((1, size, size, 1))))
    ckpt = baseline_checkpoint_path(wdir, name, cell_line, celln, deg, sigma)
    had = os.path.exists(ckpt)
    if had:
        loaded = load_checkpoint(ckpt)["params"]
        if isinstance(loaded, dict) and "params" in loaded:
            variables.update(loaded)
        else:
            variables["params"] = loaded

    @jax.jit
    def fwd(x):
        if out_range == "01":
            x = (x + 1.0) / 2.0
        if needs_pad:
            x = jnp.pad(x, ((0, 0), (6, 6), (6, 6), (0, 0)))
        out = model.apply(variables, x)
        if out_range == "01":
            out = out * 2.0 - 1.0
        return out

    def model_fn(lr_batch):
        return fwd(jnp.asarray(lr_batch))

    return model_fn, had
