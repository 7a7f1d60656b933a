"""Insulation-vector TAD-boundary machinery + InsulationLoss.

JAX re-implementation of /root/reference/src/Utils/loss/insulation.py. Inputs are
NHWC; average pools are expressed with reduce_window so the whole loss jits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["insulation_vectors", "insulation_loss", "compute_insulation"]


def _avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """VALID average pool, NHWC."""
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1), "VALID"
    )
    return out / (k * k)


def _avg_pool1d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """VALID average pool over the last axis of (b, c, n)."""
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k), (1, 1, 1), "VALID"
    )
    return out / k


def insulation_vectors(x: jnp.ndarray, window_radius: int, deriv_size: int):
    """(iv, dv): insulation vector along the pooled diagonal and its derivative
    (insulation.py:42-50). x is NHWC; pooling kernel = window_radius exactly as in
    InsulationLoss (NOT 2r+1 — that is computeInsulation's variant)."""
    iv = _avg_pool2d(x, window_radius)  # (b, h', w', c)
    iv = jnp.diagonal(iv, axis1=1, axis2=2)  # (b, c, n)
    iv = jnp.log2(iv / jnp.mean(iv))
    top = _avg_pool1d(iv[:, :, deriv_size:], deriv_size)
    bottom = _avg_pool1d(iv[:, :, :-deriv_size], deriv_size)
    return iv, top - bottom


def insulation_loss(
    output: jnp.ndarray, target: jnp.ndarray, window_radius: int = 4, deriv_size: int = 4
) -> jnp.ndarray:
    """MSE between derivative insulation vectors (insulation.py:52-56)."""
    _, dv_out = insulation_vectors(output, window_radius, deriv_size)
    _, dv_tar = insulation_vectors(target, window_radius, deriv_size)
    return ((dv_out - dv_tar) ** 2).mean()


def compute_insulation(x: jnp.ndarray, window_radius: int = 8, deriv_size: int = 8):
    """computeInsulation parity (insulation.py:8-31): 2r+1 pooling window and
    boundary detection. Returns (iv, dv, boundaries list per batch element)."""
    iv = _avg_pool2d(x, 2 * window_radius + 1)
    iv = jnp.diagonal(iv, axis1=1, axis2=2)
    iv = jnp.log2(iv / jnp.mean(iv))
    top = _avg_pool1d(iv[:, :, deriv_size:], deriv_size)
    bottom = _avg_pool1d(iv[:, :, :-deriv_size], deriv_size)
    dv = top - bottom
    b, c, n = dv.shape
    zeros = jnp.zeros((b, c, 2))
    left = jnp.concatenate([zeros, dv], axis=2)
    right = jnp.concatenate([dv, zeros], axis=2)
    band = (left < 0) & (right > 0)
    band = band[:, :, 2:-2]
    boundaries = []
    band_np = np.asarray(band)
    for i in range(band_np.shape[0]):
        boundaries.append(
            np.where(band_np[i, 0])[0] + window_radius + deriv_size
        )
    return iv, dv, boundaries
