"""Contact-map preprocessing: COO -> dense -> normalize -> band patches -> noise.

Vectorized re-design of /root/reference/processdata/PrepareData_linear.py:25-103
(the reference fills dense matrices in Python for-loops; we scatter with numpy) with
the exact same numerics: symmetric fill, zero/NaN-diagonal row removal computed on
the BALANCED matrix, percentile clip (99.0 population / 99.99 single-cell),
min-max to [0,1] then [-1,1], 64x64 patches restricted to the diagonal band
|i-j| <= piece*4*scal + 1 bins.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from hicdiff_tpu.degrade.operators import HFunction, make_operator

__all__ = [
    "coo_to_dense",
    "normalize_matrix",
    "normalize_matrix_stats",
    "apply_normalize_stats",
    "load_both_constraints",
    "split_pieces",
    "inject_noise",
    "q_sample_numpy",
    "noisy",
]


def coo_to_dense(
    start1: np.ndarray,
    start2: np.ndarray,
    values: np.ndarray,
    res: int,
    smallbin: Optional[int] = None,
    bigbin: Optional[int] = None,
    dtype="float32",
) -> Tuple[np.ndarray, int, int]:
    """Symmetric dense matrix from genomic-coordinate COO triplets.

    Mirrors the loops at PrepareData_linear.py:66-78, vectorized. Bin range
    defaults to [min, max] over rows and cols like the reference (:61-62).
    Later duplicate entries overwrite earlier ones (assignment, not accumulation),
    matching the reference's `mat[r, c] = v` semantics.
    """
    rows = (start1 / res).astype(np.int64)
    cols = (start2 / res).astype(np.int64)
    if smallbin is None:
        smallbin = int(min(rows.min(), cols.min())) if rows.size else 0
    if bigbin is None:
        bigbin = int(max(rows.max(), cols.max())) if rows.size else 0
    n = bigbin - smallbin + 1
    mat = np.zeros((n, n), dtype=dtype)
    r = rows - smallbin
    c = cols - smallbin
    # interleave (r,c),(c,r) per entry so duplicate/mirrored triplets resolve
    # exactly like the reference's sequential mat[r,c]=v; mat[c,r]=v loop
    # (last entry wins BOTH cells). The last-occurrence-per-cell selection is
    # explicit — fancy-index assignment's behavior under duplicate indices is
    # not a documented numpy guarantee — via np.unique over the reversed
    # linear indices (its first occurrence in the reversed view == the last
    # in writing order).
    ri = np.empty(2 * r.size, dtype=np.int64)
    ci = np.empty(2 * c.size, dtype=np.int64)
    ri[0::2], ri[1::2] = r, c
    ci[0::2], ci[1::2] = c, r
    lin = ri * n + ci
    _, first_in_rev = np.unique(lin[::-1], return_index=True)
    keep = lin.size - 1 - first_in_rev
    mat.flat[lin[keep]] = np.repeat(values, 2)[keep]
    return mat, smallbin, bigbin


def normalize_matrix(mat: np.ndarray, percentile: float = 99.0) -> np.ndarray:
    """Drop zero/NaN-diagonal rows+cols, percentile-clip, scale to [-1, 1]
    (PrepareData_linear.py:79-93). Returns a new array."""
    out, _, _ = normalize_matrix_stats(mat, percentile)
    return out


def normalize_matrix_stats(
    mat: np.ndarray, percentile: float = 99.0
) -> Tuple[np.ndarray, np.ndarray, float]:
    """normalize_matrix, additionally returning the normalization statistics
    (removeidx, clip value) so a SECOND matrix on the same bin grid — e.g. the
    latent pre-Poisson ground truth of a synthetic cell — can be mapped onto
    the identical [-1, 1] scale via apply_normalize_stats."""
    diag = np.diag(mat)
    removeidx = np.unique(
        np.concatenate(
            [np.argwhere(diag == 0)[:, 0], np.argwhere(np.isnan(diag))[:, 0]]
        )
    )
    kept = np.delete(np.delete(mat, removeidx, axis=0), removeidx, axis=1)
    per = float(np.percentile(kept, percentile))
    # same math as apply_normalize_stats minus its deletes — `kept` already
    # has the rows dropped, so don't delete the raw matrix a second time
    out = np.clip(kept, 0, per)
    if per > 0:
        out = out / per
    return 2 * out - 1.0, removeidx, per


def apply_normalize_stats(
    mat: np.ndarray, removeidx: np.ndarray, per: float
) -> np.ndarray:
    """Row-drop + clip + [-1,1] scale with EXTERNAL statistics (the
    (removeidx, per) pair from normalize_matrix_stats of a sibling matrix)."""
    mat = np.delete(mat, removeidx, axis=0)
    mat = np.delete(mat, removeidx, axis=1)
    mat = np.clip(mat, 0, per)
    if per > 0:
        mat = mat / per
    return 2 * mat - 1.0


def load_both_constraints(
    balanced_path: str, count_path: str, res: int, percentile: float = 99.0
) -> np.ndarray:
    """Text-COO pipeline parity with loadBothConstraints
    (PrepareData_linear.py:48-103): the count matrix only contributes to the bin
    range; the returned matrix is the normalized balanced one."""
    from hicdiff_tpu.data.fastio import load_coo_txt

    a = load_coo_txt(balanced_path)
    b = load_coo_txt(count_path)
    rows = np.concatenate([a[:, 0], a[:, 1], b[:, 0], b[:, 1]]) / res
    bigbin = int(rows.max())
    smallbin = int(rows.min())
    mata, _, _ = coo_to_dense(
        a[:, 0], a[:, 1], a[:, 2], res, smallbin=smallbin, bigbin=bigbin
    )
    return np.float32(normalize_matrix(mata, percentile))


def split_pieces(
    data: np.ndarray, piece_size: int = 64, step: int = 64, resol: int = 40000
) -> np.ndarray:
    """Diagonal-band patching (PrepareData_linear.py:25-46).

    Pads to a multiple of piece_size with zeros, then takes upper-triangle
    (piece_size x piece_size) tiles at stride `step` with
    |i - j| <= piece_size*4*scal + 1 where scal = 40000//resol.
    Returns (n_pieces, 1, piece, piece) float32 — the reference's NCHW cache
    layout, preserved so caches interoperate.
    """
    bound = data.shape[0]
    assert data.shape[0] == data.shape[1]
    scal = int(40000 / resol)
    rest = bound % piece_size
    if rest != 0:
        pad = piece_size - rest
        data = np.pad(data, ((0, pad), (0, pad)), constant_values=0.0)
    bound = data.shape[0]
    band = int(piece_size * 4 * scal + 1)
    pieces = []
    for i in range(0, bound, step):
        for j in range(i, bound, step):
            if abs(i - j) <= band and i + step <= bound and j + step <= bound:
                pieces.append(data[i : i + piece_size, j : j + piece_size])
    pieces = np.asarray(pieces, dtype=np.float32)
    return np.expand_dims(pieces, 1)


def inject_noise(
    target: np.ndarray,
    deg: str,
    sigma_0: float,
    *,
    piece_size: int = 64,
    channel: int = 1,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """y = H(x) + sigma*eps and its pseudo-inverse image
    (PrepareData_linear.py:199-207).

    The reference bakes unseeded torch noise into the cache; we seed numpy noise
    (per SURVEY.md §7: reproduce as a seeded, cached prep stage).
    Returns (pinv_y0 as (n,1,p,p) float32, y as (n, M) float32).

    The whole computation is pinned to the host CPU backend: prep is a one-time
    cached stage, and dispatching its many tiny ops to a (possibly remote) TPU
    costs orders of magnitude more than the math.
    """
    import jax
    import jax.numpy as jnp

    with jax.default_device(jax.devices("cpu")[0]):
        h = make_operator(deg, image_channel=channel, image_size=piece_size)
        x = jnp.asarray(target, dtype=jnp.float32)
        y = h.H(x)
        rng = np.random.default_rng(seed)
        noise = rng.standard_normal(size=y.shape, dtype=np.float32)
        y = y + sigma_0 * noise
        pinv = np.asarray(h.H_pinv(y)).reshape(
            target.shape[0], channel, piece_size, piece_size
        )
        if deg[:6] == "deblur":
            pinv = np.asarray(y).reshape(
                target.shape[0], channel, piece_size, piece_size
            )
        elif deg[:3] == "inp":
            ones = jnp.ones_like(x)
            pinv = pinv + (
                np.asarray(h.H_pinv(h.H(ones))).reshape(pinv.shape) - 1.0
            )
        return np.float32(pinv), np.asarray(y, dtype=np.float32)


def q_sample_numpy(
    target: np.ndarray,
    timesteps: int = 1000,
    beta_schedule: str = "linear",
    *,
    seed: int = 0,
) -> np.ndarray:
    """DDPM forward q_sample at random per-piece t — the pure_noise prep variant
    (PrepareData_pure_noise.py:65-86, 298-306)."""
    from hicdiff_tpu.diffusion.schedules import make_beta_schedule

    betas = make_beta_schedule(beta_schedule, timesteps)
    acp = np.cumprod(1.0 - betas)
    rng = np.random.default_rng(seed)
    b = target.shape[0]
    t = rng.integers(0, timesteps, size=b)
    noise = rng.standard_normal(size=target.shape).astype(np.float32)
    sa = np.sqrt(acp[t]).astype(np.float32).reshape(b, 1, 1, 1)
    soma = np.sqrt(1 - acp[t]).astype(np.float32).reshape(b, 1, 1, 1)
    return sa * target + soma * noise


def noisy(noise_typ: str, image: np.ndarray, *, seed: int = 0) -> np.ndarray:
    """Classic numpy noise injectors from the tensorH prep variant
    (PrepareData_tensorH.py:22-58): gauss / s&p / poisson / speckle on a 2-D
    matrix. gauss var=0.1, s&p amount=0.004, poisson adds
    np.random.poisson(image), speckle adds image*N(0,1); seeded here (the
    reference uses the global unseeded numpy RNG). s&p decision: the reference
    writes `out[[rows, cols]] = 1` — a LIST index, which on any numpy >= 1.23
    is advanced indexing on axis 0 and overwrites ENTIRE rows rows[i] and
    cols[i]; we implement the evident intent (paired-coordinate salt/pepper
    pixels, the classic formulation), not the modern-numpy whole-row accident
    (PARITY.md #25)."""
    rng = np.random.default_rng(seed)
    if noise_typ == "gauss":
        row, col = image.shape
        sigma = 0.1 ** 0.5
        gauss = rng.normal(0.0, sigma, (row, col))
        return image + gauss
    elif noise_typ == "s&p":
        s_vs_p = 0.5
        amount = 0.004
        out = np.copy(image)
        num_salt = int(np.ceil(amount * image.size * s_vs_p))
        coords = tuple(rng.integers(0, i - 1, num_salt) for i in image.shape)
        out[coords] = 1
        num_pepper = int(np.ceil(amount * image.size * (1.0 - s_vs_p)))
        coords = tuple(rng.integers(0, i - 1, num_pepper) for i in image.shape)
        out[coords] = 0
        return out
    elif noise_typ == "poisson":
        return image + rng.poisson(image)
    elif noise_typ == "speckle":
        row, col = image.shape
        gauss = rng.standard_normal((row, col))
        return image + image * gauss
    raise ValueError(f"unknown noise type {noise_typ!r}")
