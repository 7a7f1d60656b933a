"""Image-quality metrics: SSIM, PSNR, MSE, SNR, Pearson, Spearman.

JAX re-implementations of /root/reference/src/Utils/loss/SSIM.py (DeepHiC 11x11
sigma=1.5 gaussian-window SSIM) and the per-batch metric math of
src/Utils/stard_metrics.py:148-165. All functions take NHWC batches; SSIM runs as a
grouped convolution that XLA fuses on TPU.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_window",
    "ssim",
    "mse",
    "psnr",
    "snr",
    "pearson",
    "spearman",
    "inverse_data_transform",
]


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Normalized 2D gaussian kernel, outer product of the 1D window
    (SSIM.py:6-14)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2 = np.outer(g, g)
    return jnp.asarray(w2, dtype=jnp.float32)


def _window_conv(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Per-channel 'same' convolution with the gaussian window (zero padding,
    matching F.conv2d(padding=window//2))."""
    c = x.shape[-1]
    k = window.shape[0]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, grouped
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """DeepHiC SSIM (SSIM.py:17-74). Inputs NHWC in [0, 1]."""
    window = gaussian_window(window_size)
    mu1 = _window_conv(img1, window)
    mu2 = _window_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _window_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _window_conv(img2 * img2, window) - mu2_sq
    sigma12 = _window_conv(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def mse(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((out - target) ** 2).mean()


def psnr(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """10*log10(1/mse) — data assumed in [0,1] (stard_metrics.py:152)."""
    return 10.0 * jnp.log10(1.0 / mse(out, target))


def snr(target: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
    """hr.sum() / ||hr - out||_2, 0 when both are 0 (stard_metrics.py:155-159)."""
    denom = jnp.sqrt(((target - out) ** 2).sum())
    val = target.sum() / denom
    both_zero = (denom == 0) & (target.sum() == 0)
    return jnp.where(both_zero, 0.0, val)


def pearson(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation of flattened arrays (scipy.stats.pearsonr parity)."""
    x = x.reshape(-1).astype(jnp.float32)
    y = y.reshape(-1).astype(jnp.float32)
    xm = x - x.mean()
    ym = y - y.mean()
    return (xm * ym).sum() / jnp.sqrt((xm**2).sum() * (ym**2).sum())


def _rank(a: np.ndarray) -> np.ndarray:
    """Average ranks (scipy rankdata 'average')."""
    sorter = np.argsort(a, kind="stable")
    inv = np.empty_like(sorter)
    inv[sorter] = np.arange(len(a))
    a_sorted = a[sorter]
    obs = np.r_[True, a_sorted[1:] != a_sorted[:-1]]
    dense = obs.cumsum()[inv]
    counts = np.r_[np.nonzero(obs)[0], len(obs)]
    return 0.5 * (counts[dense] + counts[dense - 1] + 1)


def spearman(x, y) -> float:
    """Spearman rho of flattened arrays (scipy.stats.spearmanr parity). Host-side:
    ranking is a sort, cheap at 64x64xB scale."""
    x = np.asarray(x).reshape(-1)
    y = np.asarray(y).reshape(-1)
    rx, ry = _rank(x), _rank(y)
    rxm = rx - rx.mean()
    rym = ry - ry.mean()
    return float((rxm * rym).sum() / np.sqrt((rxm**2).sum() * (rym**2).sum()))


def inverse_data_transform(kind: str, x):
    """'rescaled': clamp((x+1)/2, 0, 1) (src/datasets/__init__.py:214-223)."""
    if kind == "rescaled":
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return x
