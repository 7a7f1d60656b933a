"""TPU-native 3D chromosome-structure reconstruction.

The reference delegates structure inference to the external 3DMax Java tool
(`java -jar 3DMax.jar`, /root/reference/pretrain/3DComp.py:365-386), which it
`git clone`s at runtime — unavailable in a hermetic image and a process
boundary the TPU cannot help with. This module is a native replacement built
on the same distance model 3DMax's parameter files describe
(CONVERT_FACTOR=0.6, NUM=3 structures, gradient optimization): contact
frequencies become wish distances d_ij = (1/f_ij)^factor, and an ensemble of
structures is fit by minimizing the normalized stress

    L(X) = sum_ij w_ij (||x_i - x_j|| - d_ij)^2,   w_ij = 1 / d_ij^2

with Adam, one `lax.fori_loop` under `jit`, `vmap`-batched over the ensemble
(and over blocks by the caller). Mirror ambiguity is inherent to
distance-only reconstruction; compare ensembles with TM-score on both
chiralities (pairwise_tm_scores in structure3d.py handles superposition).

Outputs are written as CA-trace PDB files interchangeable with 3DMax's, so
the downstream TM-score/RMSD comparison (structure3d.py:109-165) is agnostic
to which engine produced them.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

__all__ = [
    "wish_distances",
    "reconstruct",
    "reconstruction_spearman",
    "save_pdb",
    "reconstruct_to_pdbs",
]


def wish_distances(
    mat: np.ndarray, factor: float = 0.6
) -> Tuple[np.ndarray, np.ndarray]:
    """Contact matrix -> (wish distance matrix, constraint mask).

    d_ij = (1/f_ij)^factor for f_ij > 0 (the 3DMax CONVERT_FACTOR model);
    zero/negative contacts contribute no constraint. Distances are scaled so
    the mean constrained distance is 1 (the optimum is scale-free; PDB output
    rescales to a conventional size).
    """
    f = np.asarray(mat, np.float64)
    f = np.maximum((f + f.T) / 2.0, 0.0)  # symmetrize
    np.fill_diagonal(f, 0.0)
    mask = f > 0
    d = np.zeros_like(f)
    d[mask] = (1.0 / f[mask]) ** factor
    if mask.any():
        d[mask] /= d[mask].mean()
    return d, mask


def _pairwise_dist(x, eps=1e-8):
    import jax.numpy as jnp

    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return jnp.sqrt(jnp.maximum(d2, eps))


def _fit_ensemble(d, w, keys, max_iter: int, lr: float):
    """Jitted ensemble fit. Module-level with (d, w, keys) as ARGUMENTS so the
    compiled program is shared across blocks — a closure would bake each
    block's matrices into the jaxpr as constants and force a fresh remote
    compile per block (compiles dominate on this backend, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    import optax

    n = d.shape[0]
    wsum = jnp.sum(w)

    def stress(x):
        dist = _pairwise_dist(x)
        return jnp.sum(w * (dist - d) ** 2) / wsum

    opt = optax.adam(lr)

    def fit_one(key):
        x0 = 0.5 * jax.random.normal(key, (n, 3), jnp.float32)
        state0 = opt.init(x0)

        def body(_, carry):
            x, state = carry
            g = jax.grad(stress)(x)
            updates, state = opt.update(g, state, x)
            return optax.apply_updates(x, updates), state

        x, _ = jax.lax.fori_loop(0, max_iter, body, (x0, state0))
        return x, stress(x)

    return jax.vmap(fit_one)(keys)


_FIT_CACHE: dict = {}


def _jitted_fit():
    """One process-wide jit wrapper (a fresh jax.jit per call would defeat
    both the in-process trace cache and the persistent compile cache)."""
    if "fit" not in _FIT_CACHE:
        import jax

        _FIT_CACHE["fit"] = jax.jit(_fit_ensemble, static_argnums=(3, 4))
    return _FIT_CACHE["fit"]


def reconstruct(
    mat: np.ndarray,
    *,
    factor: float = 0.6,
    num: int = 3,
    max_iter: int = 2000,
    lr: float = 0.05,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit `num` structures to one contact matrix.

    Returns (coords (num, n, 3) float64, final stress per structure (num,)).
    Mirrors the 3DMax parameter-file contract (NUM, CONVERT_FACTOR,
    LEARNING_RATE, MAX_ITERATION — 3DComp.py:346-363) as keyword arguments.
    """
    import jax
    import jax.numpy as jnp

    d_np, mask_np = wish_distances(mat, factor)
    n = d_np.shape[0]
    if not mask_np.any() or n < 2:
        return np.zeros((num, n, 3)), np.zeros((num,))

    d = jnp.asarray(d_np, jnp.float32)
    w = jnp.asarray(np.where(mask_np, 1.0 / np.maximum(d_np, 1e-6) ** 2, 0.0),
                    jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), num)
    coords, losses = _jitted_fit()(d, w, keys, max_iter, lr)
    return np.asarray(coords, np.float64), np.asarray(losses, np.float64)


def reconstruction_spearman(coords: np.ndarray, mat: np.ndarray,
                            factor: float = 0.6) -> float:
    """Spearman correlation between reconstructed distances and wish distances
    over the constrained pairs — the standard distance-based validation score."""
    from scipy.stats import spearmanr

    d, mask = wish_distances(mat, factor)
    diff = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt((diff**2).sum(-1))
    iu = np.triu_indices(d.shape[0], k=1)
    sel = mask[iu]
    if sel.sum() < 3:
        return float("nan")
    return float(spearmanr(dist[iu][sel], d[iu][sel]).statistic)


def save_pdb(coords: np.ndarray, path: str, *, scale: float = 10.0):
    """Write one structure as a CA-trace PDB (readable by parse_pdb_ca and any
    molecular viewer; same convention as 3DMax's output ensembles)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    c = np.asarray(coords, np.float64) * scale
    with open(path, "w") as f:
        for i, (x, y, z) in enumerate(c, start=1):
            f.write(
                f"ATOM  {i:5d}  CA  GLY A{i:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C\n"
            )
        for i in range(1, len(c)):
            f.write(f"CONECT{i:5d}{i+1:5d}\n")
        f.write("END\n")


def reconstruct_to_pdbs(
    mat: np.ndarray,
    out_prefix: str,
    *,
    factor: float = 0.6,
    num: int = 3,
    max_iter: int = 2000,
    lr: float = 0.05,
    seed: int = 0,
) -> list:
    """Reconstruct and write `num` PDBs: {out_prefix}_{k}.pdb. Returns paths."""
    coords, _ = reconstruct(
        mat, factor=factor, num=num, max_iter=max_iter, lr=lr, seed=seed
    )
    paths = []
    for k in range(coords.shape[0]):
        p = f"{out_prefix}_{k}.pdb"
        save_pdb(coords[k], p)
        paths.append(p)
    return paths
