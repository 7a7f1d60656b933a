"""Diffusion noise schedules and the derived constant tables.

Reference semantics: /root/reference/src/hicdiff.py:396-430 (linear/cosine/sigmoid
beta schedules, computed in float64) and :472-522 (constants registered as float32
buffers).  We reproduce that exactly: every schedule is computed in float64 numpy on
the host, the derived tables are computed in float64, and only then cast to float32 —
matching the reference's fp64->fp32 buffer cast bit-for-bit-ish (SURVEY.md §7 "Hard
parts").

Additionally implements the numpy `get_beta_schedule` family used by the DDRM
evaluation path (/root/reference/src/Utils/metrics_diff.py:36-81): quad / linear /
const / jsd / sigmoid(alpha-bar).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "sigmoid_beta_schedule",
    "make_beta_schedule",
    "get_beta_schedule",
    "DiffusionSchedule",
    "make_schedule",
]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear schedule from the original DDPM paper (hicdiff.py:396-403)."""
    scale = 1000 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (hicdiff.py:405-415)."""
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    """Sigmoid schedule (hicdiff.py:417-430)."""

    def _sigmoid(x):
        return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))

    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    # quirk parity: torch.tensor(start/tau).sigmoid() evaluates in float32
    # (hicdiff.py:425-426) before mixing into the float64 pipeline
    def _sigmoid_f32(x):
        x32 = np.float32(x)
        return np.float64(np.float32(1.0) / (np.float32(1.0) + np.exp(-x32)))

    v_start = _sigmoid_f32(start / tau)
    v_end = _sigmoid_f32(end / tau)
    alphas_cumprod = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


def make_beta_schedule(name: str, timesteps: int, **kwargs) -> np.ndarray:
    if name not in _SCHEDULES:
        raise ValueError(f"unknown beta schedule {name}")
    return _SCHEDULES[name](timesteps, **kwargs)


def get_beta_schedule(
    beta_schedule: str, *, beta_start: float, beta_end: float, num_diffusion_timesteps: int
) -> np.ndarray:
    """The DDRM-side schedule family (metrics_diff.py:36-81).

    Note `sigmoid` here differs from `sigmoid_beta_schedule` above: it is a sigmoid
    ramp applied directly to betas (alpha-bar style), matching the reference.
    """

    def sigmoid(x):
        return 1 / (np.exp(-x) + 1)

    n = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(n, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        betas = np.linspace(-6, 6, n)
        betas = sigmoid(betas) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (n,)
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable table of diffusion constants, all shape (T,) float32 on device.

    Field-for-field equivalent of the float32 buffers registered at
    hicdiff.py:494-522.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray
    # SR3 extra (hicdiff_sr3.py:536): sqrt(pad(alphas_cumprod_prev, 1)) — i.e.
    # sqrt([1, 1, acp[0], ..., acp[T-2]]), length T+1. Indices 0..T are the ones the
    # SR3 engine actually reads (p_losses t in [1,T]; p_mean_variance t+1 in [1,T]).
    sqrt_alphas_cumprod_prev: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    name: str,
    timesteps: int,
    *,
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
    betas: np.ndarray | None = None,
    **schedule_kwargs,
) -> DiffusionSchedule:
    """Build all derived constants in float64, cast to float32 (hicdiff.py:472-522)."""
    if betas is None:
        betas = make_beta_schedule(name, timesteps, **schedule_kwargs)
    betas = np.asarray(betas, dtype=np.float64)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
    # alphas_cumprod can reach exactly 0 at t=T-1 (linear schedule with small
    # T scales beta_end to 1.0); 1/0 -> inf matches torch's buffers exactly
    # (parity-tested), so run those divisions quietly
    with np.errstate(divide="ignore"):
        sqrt_recip_acp = np.sqrt(1.0 / alphas_cumprod)
        sqrt_recipm1_acp = np.sqrt(1.0 / alphas_cumprod - 1.0)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(sqrt_recip_acp),
        sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1_acp),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma
        ),
        sqrt_alphas_cumprod_prev=f32(
            np.sqrt(np.concatenate([[1.0], alphas_cumprod_prev]))
        ),
    )
