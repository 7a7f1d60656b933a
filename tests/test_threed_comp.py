"""Unit tests for threed_comp.export_blocks (3DComp constraint export)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threed_comp import export_blocks


def _patches(n=4, diag=True):
    rng = np.random.default_rng(0)
    arr = rng.random((n, 1, 8, 8)).astype(np.float32) * 2 - 1
    if not diag:
        for i in range(n):
            np.fill_diagonal(arr[i, 0], -1.0)  # maps to 0 after [0,1] rescale
    return arr


def test_export_all_blocks_by_default(tmp_path):
    arr = _patches(5)
    inds = np.arange(5)
    written, dropped, _ = export_blocks(
        "target", arr, inds, str(tmp_path), threshold=0.3, max_blocks=0,
        diagonal_only=False,
    )
    assert written == 5 and dropped == 0
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 5
    # upper-triangle i\tj\tval rows
    lines = open(tmp_path / files[0]).read().strip().split("\n")
    i, j, v = lines[0].split("\t")
    assert int(j) >= int(i) and 0.0 <= float(v) <= 1.0


def test_max_blocks_reports_dropped(tmp_path):
    arr = _patches(5)
    written, dropped, _ = export_blocks(
        "predict", arr, np.arange(5), str(tmp_path), threshold=0.3,
        max_blocks=2, diagonal_only=False,
    )
    assert written == 2 and dropped == 3


def test_diagonal_only_filter(tmp_path):
    arr = np.concatenate([_patches(2), _patches(2, diag=False)])
    written, dropped, _ = export_blocks(
        "noisy", arr, np.arange(4), str(tmp_path), threshold=0.3,
        max_blocks=0, diagonal_only=True,
    )
    assert written == 2 and dropped == 2


def test_nhwc_input_accepted(tmp_path):
    arr = np.transpose(_patches(3), (0, 2, 3, 1))  # NHWC
    written, dropped, _ = export_blocks(
        "target", arr, np.arange(3), str(tmp_path), threshold=0.3,
        max_blocks=0, diagonal_only=False,
    )
    assert written == 3 and dropped == 0


def test_quartet_native_engine_end_to_end(tmp_path):
    """threed_comp.py --engine native: quartet -> constraints + params + PDB
    ensembles + TM table, with no java dependency."""
    import subprocess

    qdir = tmp_path / "quartet"
    qdir.mkdir()
    rng = np.random.default_rng(1)
    # small, banded patches so reconstruction has constraints
    base = rng.random((2, 1, 12, 12)).astype(np.float32)
    base = (base + base.transpose(0, 1, 3, 2)) / 2 * 2 - 1
    np.save(qdir / "target.npy", base)
    np.save(qdir / "noisy.npy", np.clip(base + 0.1, -1, 1))
    np.save(qdir / "predict.npy", np.clip(base + 0.05, -1, 1))
    np.save(qdir / "inds.npy", np.arange(2))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wdir = tmp_path / "work"
    # force CPU in the subprocess (PALLAS_AXON_POOL_IPS disables the remote
    # TPU registration — same recipe as test_cli.cpu_env)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "threed_comp.py"), str(qdir),
         "--workdir", str(wdir), "--engine", "native", "--num", "2",
         "--max-iter", "150", "--root", str(tmp_path)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    pdbs = sorted((wdir / "output").glob("*.pdb"))
    # 3 sources x 2 blocks x 2 structures
    assert len(pdbs) == 12, [p.name for p in pdbs]
    assert "TM(predict vs target)" in res.stdout
    assert "TM(noisy vs target)" in res.stdout
    # the reference's result surface (3DComp.py:544-651): per-model TM table
    # + distribution plot under Metrics/
    table = tmp_path / "Metrics" / "3d_tm_scores_quartet.txt"
    assert table.exists(), res.stdout[-2000:]
    body = table.read_text()
    assert "predict" in body and "noisy" in body and "mean" in body
    assert (tmp_path / "Metrics" / "3d_tm_boxplot_quartet.png").exists()


def test_quartet_chro_filter(tmp_path):
    """--quartet-chro restricts a saved quartet by its inds labels (e.g. a
    whole-cell run -> the test split) and refuses an empty selection."""
    import subprocess

    qdir = tmp_path / "quartet"
    qdir.mkdir()
    rng = np.random.default_rng(2)
    base = rng.random((3, 1, 12, 12)).astype(np.float32)
    base = (base + base.transpose(0, 1, 3, 2)) / 2 * 2 - 1
    np.save(qdir / "target.npy", base)
    np.save(qdir / "noisy.npy", np.clip(base + 0.1, -1, 1))
    np.save(qdir / "predict.npy", np.clip(base + 0.05, -1, 1))
    np.save(qdir / "inds.npy", np.array([2, 5, 6]))  # 2,6 in the test split

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "threed_comp.py"), str(qdir),
         "--workdir", str(tmp_path / "w1"), "--engine", "native", "--num", "2",
         "--max-iter", "50", "--root", str(tmp_path),
         "--quartet-chro", "test"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "2/3 quartet patches kept" in res.stdout
    # chromosome 5 (train split) must not have been exported
    names = [p.name for p in (tmp_path / "w1" / "output").glob("*.pdb")]
    assert names and not any(n.startswith("chro_5_") for n in names)

    res = subprocess.run(
        [sys.executable, os.path.join(repo, "threed_comp.py"), str(qdir),
         "--workdir", str(tmp_path / "w2"), "--engine", "native",
         "--root", str(tmp_path), "--quartet-chro", "21"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode != 0
    assert "no quartet" in (res.stdout + res.stderr)
