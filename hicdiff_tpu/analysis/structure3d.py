"""3D chromosome-structure comparison pipeline.

Re-design of /root/reference/pretrain/3DComp.py / 3DComp_diff.py: threshold
rescaling of predicted contact maps, per-64-bin-block upper-triangle constraint
export, 3DMax parameter files (NUM=3, CONVERT_FACTOR=0.6, LEARNING_RATE=1,
MAX_ITERATION=10000 — 3DComp.py:346-363), optional `java -jar 3DMax.jar`
invocation (gated on java + the jar being present; the reference `git clone`s
3DMax at runtime, 3DComp.py:372 — impossible in a zero-egress image, so the jar
path is a parameter), PDB CA-trace parsing, and TM-score/RMSD comparison.

TM-score: the reference shells out to the `tmscoring` pip package (absent here);
we implement Kabsch superposition + the standard TM-score formula
(d0 = 1.24*(L-15)^(1/3) - 1.8) on CA coordinates. Kabsch optimizes RMSD rather
than TM directly — scores are comparable but can differ slightly from TM-align
style optimization; documented trade-off.
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

__all__ = [
    "threshold_rescale",
    "write_constraints",
    "build_parameters",
    "run_3dmax",
    "parse_pdb_ca",
    "kabsch",
    "tm_score",
    "rmsd",
    "pairwise_tm_scores",
]


def threshold_rescale(mat: np.ndarray, threshold: float = 0.3, factor: float = 3.0):
    """Scale small values (3DComp.py:180-207): x[x < t] *= factor. Returns a
    copy. The reference uses factor 3 for predictions/noisy and 2 for targets."""
    out = np.array(mat, copy=True)
    mask = out < threshold
    out[mask] = out[mask] * factor
    return out


def write_constraints(mat: np.ndarray, path: str):
    """Upper-triangle `i\\tj\\tvalue` constraint file for one 64-bin block
    (3DComp.py:318-331), through the native C++ buffered writer (falls back
    to numpy when the toolchain is unavailable)."""
    from hicdiff_tpu.data.fastio import save_coo_txt

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = mat.shape[0]
    ii, jj = np.triu_indices(n)
    triplets = np.column_stack([ii, jj, mat[ii, jj]]).astype(np.float64)
    save_coo_txt(path, triplets)


def build_parameters(
    constraints_glob: str,
    params_dir: str,
    output_dir: str,
    *,
    num: int = 3,
    convert_factor: float = 0.6,
    learning_rate: float = 1,
    max_iteration: int = 10000,
) -> List[str]:
    """3DMax parameter files, one per constraint file (3DComp.py:346-363)."""
    os.makedirs(params_dir, exist_ok=True)
    out = []
    for constraint in sorted(glob.glob(constraints_glob)):
        suffix = os.path.basename(constraint)
        text = (
            f"NUM = {num}\r\n"
            f"OUTPUT_FOLDER = {output_dir}/\r\n"
            f"INPUT_FILE = {constraint}\r\n"
            f"CONVERT_FACTOR = {convert_factor}\r\n"
            "VERBOSE = true\r\n"
            f"LEARNING_RATE = {learning_rate}\r\n"
            f"MAX_ITERATION = {max_iteration}\n"
        )
        path = os.path.join(params_dir, suffix)
        with open(path, "w") as f:
            f.write(text)
        out.append(path)
    return out


def run_3dmax(param_files: Iterable[str], jar_location: str, xmx_mb: int = 5000):
    """Invoke 3DMax per parameter file (3DComp.py:371-386). Requires java and
    the jar on disk; raises with a clear message otherwise."""
    if shutil.which("java") is None:
        raise RuntimeError("java not found on PATH — 3DMax cannot run")
    if not os.path.exists(jar_location):
        raise FileNotFoundError(
            f"3DMax.jar not found at {jar_location}; clone BDM-Lab/3DMax and "
            "pass its jar path"
        )
    for par in param_files:
        subprocess.run(
            ["java", f"-Xmx{xmx_mb}m", "-jar", jar_location, par], check=True
        )


def parse_pdb_ca(path: str) -> np.ndarray:
    """CA-atom coordinates from a PDB file -> (L, 3)."""
    coords = []
    with open(path) as f:
        for line in f:
            if line.startswith(("ATOM", "HETATM")) and line[12:16].strip() in (
                "CA",
                "C1",
            ):
                coords.append(
                    [float(line[30:38]), float(line[38:46]), float(line[46:54])]
                )
    return np.asarray(coords, dtype=np.float64)


def kabsch(p: np.ndarray, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal rotation/translation superposing p onto q (least-squares)."""
    pc = p - p.mean(axis=0)
    qc = q - q.mean(axis=0)
    h = pc.T @ qc
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    p_aligned = pc @ rot.T + q.mean(axis=0)
    return p_aligned, rot


def rmsd(p: np.ndarray, q: np.ndarray) -> float:
    p_aligned, _ = kabsch(p, q)
    return float(np.sqrt(((p_aligned - q) ** 2).sum(axis=1).mean()))


def tm_score(p: np.ndarray, q: np.ndarray) -> float:
    """TM-score of superposed structures; d0 per Zhang & Skolnick 2004."""
    assert p.shape == q.shape and p.shape[0] > 0
    L = p.shape[0]
    p_aligned, _ = kabsch(p, q)
    d = np.sqrt(((p_aligned - q) ** 2).sum(axis=1))
    d0 = max(1.24 * (L - 15) ** (1.0 / 3.0) - 1.8, 0.5) if L > 15 else 0.5
    return float(np.mean(1.0 / (1.0 + (d / d0) ** 2)))


def pairwise_tm_scores(
    pdbs_a: List[str], pdbs_b: List[str]
) -> Dict[Tuple[str, str], Tuple[float, float]]:
    """All-pairs (TM, RMSD) between two PDB ensembles (3DComp.py:388-537
    compares every reconstructed model pair).

    Scored on BOTH chiralities of the first structure (best TM wins, with
    its RMSD): kabsch() is proper-rotation only, and distance-based
    reconstruction (3DMax's model and the native engine alike) leaves the
    global mirror unconstrained, so ~half of structure pairs would otherwise
    score against their reflection."""
    out = {}
    for pa in pdbs_a:
        ca = parse_pdb_ca(pa)
        for pb in pdbs_b:
            cb = parse_pdb_ca(pb)
            n = min(len(ca), len(cb))
            if n == 0:
                continue
            scored = [
                (tm_score(cam[:n], cb[:n]), rmsd(cam[:n], cb[:n]))
                for cam in (ca, ca * np.array([1.0, 1.0, -1.0]))
            ]
            out[(pa, pb)] = max(scored, key=lambda s: s[0])
    return out
