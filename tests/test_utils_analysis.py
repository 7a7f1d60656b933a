"""Tests: io utilities vs reference semantics, 3D-structure machinery."""
import os

import numpy as np
import pytest

from hicdiff_tpu.analysis.structure3d import (
    build_parameters,
    kabsch,
    rmsd,
    threshold_rescale,
    tm_score,
    write_constraints,
    parse_pdb_ca,
)
from hicdiff_tpu.utils.config import dict2namespace
from hicdiff_tpu.utils.io import (
    compactM,
    dense2tag,
    divide,
    downsampling,
    pooling,
    spreadM,
    tag2dense,
    together,
)


def test_compact_spread_roundtrip():
    rng = np.random.default_rng(0)
    full = rng.integers(0, 5, (10, 10))
    idx = [0, 2, 3, 7, 9]
    c = compactM(full, idx)
    assert c.shape == (5, 5)
    s = spreadM(c, idx, 10)
    np.testing.assert_array_equal(s[np.ix_(idx, idx)], c)
    assert s[1, :].sum() == 0


def test_dense_tag_roundtrip():
    rng = np.random.default_rng(1)
    m = rng.integers(0, 4, (8, 8))
    m = np.triu(m) + np.triu(m, 1).T  # symmetric
    tag, n = dense2tag(m)
    assert n == np.triu(m).sum()
    back = tag2dense(tag, 8)
    np.testing.assert_array_equal(back, m)


def test_downsampling_reduces_reads():
    rng = np.random.default_rng(2)
    m = rng.integers(0, 10, (16, 16))
    m = np.triu(m) + np.triu(m, 1).T
    down = downsampling(m, 4, seed=0)
    assert np.triu(down).sum() == np.triu(m).sum() // 4


def test_divide_and_together():
    mat = np.arange(100 * 100, dtype=float).reshape(100, 100)
    chunks, idx = divide(mat, 1, chunk_size=40, stride=28, bound=201)
    assert chunks.shape[1:] == (1, 40, 40)
    res = together(chunks, idx, corp=0)
    assert 1 in res and res[1].shape == (100, 100)


def test_pooling():
    m = np.arange(16, dtype=float).reshape(4, 4)
    avg = pooling(m, 2, "avg", return_array=True)
    np.testing.assert_allclose(avg, [[2.5, 4.5], [10.5, 12.5]])
    mx = pooling(m, 2, "max", return_array=True)
    np.testing.assert_allclose(mx, [[5, 7], [13, 15]])


def test_dict2namespace():
    ns = dict2namespace({"a": 1, "b": {"c": 2}})
    assert ns.a == 1 and ns.b.c == 2


def test_threshold_rescale():
    m = np.array([[0.1, 0.5], [0.2, 0.9]])
    out = threshold_rescale(m, 0.3, 3.0)
    np.testing.assert_allclose(out, [[0.3, 0.5], [0.6, 0.9]])
    np.testing.assert_allclose(m, [[0.1, 0.5], [0.2, 0.9]])  # input untouched


def test_constraints_and_parameters(tmp_path):
    m = np.random.default_rng(0).uniform(size=(8, 8))
    cpath = str(tmp_path / "Constraints" / "chro_1_target_0_")
    write_constraints(m, cpath)
    lines = open(cpath).read().strip().split("\n")
    assert len(lines) == 8 * 9 // 2
    i, j, v = lines[1].split("\t")
    assert (int(i), int(j)) == (0, 1)
    params = build_parameters(
        str(tmp_path / "Constraints" / "chro_1_*"),
        str(tmp_path / "Parameters"),
        str(tmp_path / "output"),
    )
    assert len(params) == 1
    text = open(params[0]).read()
    assert "CONVERT_FACTOR = 0.6" in text and "MAX_ITERATION = 10000" in text


def test_tm_score_identity_and_rotation():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(50, 3)) * 10
    assert tm_score(p, p) == pytest.approx(1.0)
    # arbitrary rotation + translation: TM stays 1, RMSD ~ 0
    theta = 0.7
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    q = p @ rot.T + np.array([5.0, -3.0, 2.0])
    assert tm_score(p, q) == pytest.approx(1.0, abs=1e-6)
    assert rmsd(p, q) == pytest.approx(0.0, abs=1e-6)
    # perturbed structure scores lower
    q2 = q + rng.normal(size=q.shape) * 3
    assert tm_score(p, q2) < 0.9


def test_parse_pdb_ca(tmp_path):
    pdb = tmp_path / "m.pdb"
    pdb.write_text(
        "ATOM      1  CA  MET A   1      11.104   6.134  -6.504  1.00  0.00\n"
        "ATOM      2  CB  MET A   1       1.000   2.000   3.000  1.00  0.00\n"
        "ATOM      3  CA  GLY A   2      12.000   7.000  -5.000  1.00  0.00\n"
    )
    ca = parse_pdb_ca(str(pdb))
    assert ca.shape == (2, 3)
    np.testing.assert_allclose(ca[0], [11.104, 6.134, -6.504])
