"""Patch-reassembly and denoised-export tests (data/assemble.py).

The roundtrip property is exact: split_pieces -> assemble_chromosome must
restore every cell the band grid covers, including non-multiple-of-piece
sizes (zero padding) and sub-band tile exclusion.
"""
import numpy as np
import pytest

from hicdiff_tpu.data.assemble import (
    assemble_by_chromosome,
    assemble_chromosome,
    band_tile_offsets,
    to_unit,
    write_mcool,
)
from hicdiff_tpu.data.preprocess import coo_to_dense, split_pieces


def _sym_banded(n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, n)).astype(np.float32)
    m = (m + m.T) / 2
    return np.clip(m, -1, 1)


def _covered_mask(n_bins, piece, resol):
    mask = np.zeros((n_bins, n_bins), bool)
    for i, j in band_tile_offsets(n_bins, piece, piece, resol):
        mask[i : i + piece, j : j + piece] = True
        mask[j : j + piece, i : i + piece] = True
    return mask[:n_bins, :n_bins]


@pytest.mark.parametrize("n_bins", [128, 100, 192])
def test_split_assemble_roundtrip(n_bins):
    piece, resol = 32, 40000
    mat = _sym_banded(n_bins)
    pieces = split_pieces(mat, piece_size=piece, step=piece, resol=resol)
    assert pieces.shape[0] == band_tile_offsets(n_bins, piece, piece, resol).shape[0]
    out = assemble_chromosome(pieces, n_bins, piece_size=piece, resol=resol)
    assert out.shape == (n_bins, n_bins)
    covered = _covered_mask(n_bins, piece, resol)
    np.testing.assert_allclose(out[covered], mat[covered], atol=1e-6)
    assert np.all(out[~covered] == 0)
    np.testing.assert_allclose(out, out.T)  # exactly symmetric


def test_assemble_symmetrizes_model_output():
    """Asymmetric per-patch predictions come back as a symmetric matrix with
    diagonal tiles averaged."""
    n, piece = 64, 64
    tile = np.triu(np.ones((piece, piece), np.float32))
    out = assemble_chromosome(tile[None, None], n, piece_size=piece)
    np.testing.assert_allclose(out, out.T)
    # diagonal tile averaged with its transpose: triu ones -> 0.5 off-diagonal
    assert out[0, 1] == 0.5 and out[1, 0] == 0.5
    np.testing.assert_allclose(np.diag(out), 1.0)


def test_assemble_nhwc_and_count_mismatch():
    n, piece = 96, 32
    mat = _sym_banded(n, seed=1)
    pieces = split_pieces(mat, piece_size=piece, step=piece, resol=40000)
    nhwc = np.transpose(pieces, (0, 2, 3, 1))
    out = assemble_chromosome(nhwc, n, piece_size=piece)
    covered = _covered_mask(n, piece, 40000)
    np.testing.assert_allclose(out[covered], mat[covered], atol=1e-6)
    with pytest.raises(ValueError, match="band grid"):
        assemble_chromosome(pieces[:-1], n, piece_size=piece)


def test_assemble_by_chromosome_grouping():
    piece = 32
    sizes = {1: 96, 3: 64}
    mats = {c: _sym_banded(n, seed=c) for c, n in sizes.items()}
    pieces = {
        c: split_pieces(m, piece_size=piece, step=piece, resol=40000)
        for c, m in mats.items()
    }
    predict = np.concatenate([pieces[1], pieces[3]])
    inds = np.concatenate(
        [np.repeat(1, len(pieces[1])), np.repeat(3, len(pieces[3]))]
    )
    dense = assemble_by_chromosome(predict, inds, sizes, piece_size=piece)
    assert set(dense) == {1, 3}
    for c in dense:
        covered = _covered_mask(sizes[c], piece, 40000)
        np.testing.assert_allclose(dense[c][covered], mats[c][covered], atol=1e-6)


def test_write_mcool_roundtrip(tmp_path):
    """write_mcool output is readable by the pipeline's own McoolFile reader
    and reproduces the dense matrices."""
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from hicdiff_tpu.data.mcool import McoolFile

    res = 40000
    mats = {1: to_unit(_sym_banded(24, seed=2)), 2: to_unit(_sym_banded(16, seed=3))}
    path = str(tmp_path / "denoised.mcool")
    write_mcool(path, res, mats)

    mc = McoolFile(path, res)
    for c, m in mats.items():
        px = mc.fetch(f"chr{c}")
        dense, _, _ = coo_to_dense(
            px.start1, px.start2, px.balanced, res, smallbin=0,
            bigbin=m.shape[0] - 1,
        )
        np.testing.assert_allclose(dense, m, atol=1e-6)
