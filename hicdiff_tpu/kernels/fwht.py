"""Fast Walsh-Hadamard transform, TPU-native.

The reference computes the FWHT with a 12-pass butterfly over HBM
(svd_replacement.py:272-283) — bandwidth-bound on any accelerator. On TPU the
right formulation is algebraic: the natural-order Hadamard matrix factorizes as
H_{n^2} = H_n (x) H_n (Sylvester/Kronecker), so the transform of an n x n image
is two n x n matmuls, H_n @ X @ H_n^T — pure MXU work, one fused XLA op pair,
no multi-pass HBM traffic. For 64x64 patches that is H_64 twice.

`fwht_butterfly` keeps the reference-shaped loop (used as a cross-check and for
non-square sizes).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["hadamard_matrix", "fwht_matmul", "fwht_butterfly"]


@lru_cache(maxsize=8)
def _hadamard_np(n: int) -> np.ndarray:
    """Sylvester Hadamard matrix of size n (n a power of 2), natural order."""
    assert n & (n - 1) == 0, "n must be a power of 2"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_hadamard_np(n), dtype=dtype)


def fwht_matmul(x: jnp.ndarray, img_dim: int) -> jnp.ndarray:
    """FWHT over the last axis of (..., img_dim**2), normalized by 1/img_dim
    (matching svd_replacement.py:282's /img_dim so that fwht is an involution).

    Implemented as H @ X @ H^T on the (img_dim, img_dim) unflattening — the
    Kronecker identity (H_n (x) H_n) vec(X) = vec(H_n X H_n^T).
    """
    lead = x.shape[:-1]
    h = hadamard_matrix(img_dim, x.dtype)
    img = x.reshape(*lead, img_dim, img_dim)
    out = jnp.einsum(
        "ij,...jk,lk->...il", h, img, h, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return out.reshape(*lead, img_dim * img_dim) / img_dim


def fwht_butterfly(x: jnp.ndarray, img_dim: int) -> jnp.ndarray:
    """Reference-shaped log2(n) butterfly (svd_replacement.py:272-283)."""
    lead = x.shape[:-1]
    n = img_dim * img_dim
    a = x.reshape(-1, n)
    h = 1
    while h < n:
        a = a.reshape(a.shape[0], -1, h * 2)
        lo, hi = a[..., :h], a[..., h:]
        a = jnp.concatenate([lo + hi, lo - hi], axis=-1)
        h *= 2
    return a.reshape(*lead, n) / img_dim
