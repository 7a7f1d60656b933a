"""hicdiff_tpu — TPU-native diffusion denoising of single-cell Hi-C contact maps.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
BioinfoMachineLearning/hicdiff (see SURVEY.md for the reference analysis).
"""

__version__ = "0.1.0"

from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
from hicdiff_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_schedule,
)
from hicdiff_tpu.models.fastpath import FusedHicedrn
from hicdiff_tpu.models.hicedrn import HicedrnDiff, HicedrnGenerator
from hicdiff_tpu.models.unet import Unet
from hicdiff_tpu.models.unet1d import Unet1D
from hicdiff_tpu.models.zoo import BASELINES, load_baseline
from hicdiff_tpu.degrade.operators import make_operator
from hicdiff_tpu.sampling.ddrm import ddrm_sample, efficient_generalized_steps

__all__ = [
    "GaussianDiffusion",
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_schedule",
    "FusedHicedrn",
    "HicedrnDiff",
    "HicedrnGenerator",
    "Unet",
    "Unet1D",
    "BASELINES",
    "load_baseline",
    "make_operator",
    "ddrm_sample",
    "efficient_generalized_steps",
]
