"""Data-layer tests: native mcool reader ground truth, preprocessing semantics,
band patching counts, end-to-end data module on a synthetic fixture."""
import os

import numpy as np
import pytest

from hicdiff_tpu.data.datamodule import (
    DROS_SPLITS,
    HUMAN_SPLITS,
    HiCDataModule,
    NumpyLoader,
)
from hicdiff_tpu.data.mcool import McoolFile, list_coolers
from hicdiff_tpu.data.preprocess import (
    coo_to_dense,
    normalize_matrix,
    split_pieces,
    inject_noise,
)
from tests.make_fixture_mcool import make_fixture


@pytest.fixture(scope="module")
def fixture_mcool(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mcool") / "cell1_synth.mcool")
    path, truth = make_fixture(path, bins_per_chrom=(48, 32))
    return path, truth


def test_mcool_reader_matches_truth(fixture_mcool):
    path, truth = fixture_mcool
    assert list_coolers(path) == ["/resolutions/40000"]
    mc = McoolFile(path, 40000)
    assert mc.chromnames == ["chr1", "chr2"]
    for chrom, ref in truth.items():
        px = mc.fetch(chrom)
        dense, _, _ = coo_to_dense(
            px.start1, px.start2, px.balanced, 40000,
            smallbin=0, bigbin=ref.shape[0] - 1,
        )
        np.testing.assert_allclose(dense, ref, atol=1e-6)


def test_normalize_matrix_semantics():
    n = 32
    rng = np.random.default_rng(0)
    mat = rng.uniform(0, 10, (n, n))
    mat = (mat + mat.T) / 2
    mat[3, 3] = 0.0  # zero diagonal -> row/col 3 removed
    mat[7, 7] = np.nan
    out = normalize_matrix(mat.copy(), percentile=99.0)
    assert out.shape == (n - 2, n - 2)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # clip point: values above the 99th percentile all map to exactly 1.0
    assert (out == 1.0).sum() >= 1


def test_split_pieces_band_rule():
    """n x n multiple-of-64 matrix at 40kb: each row i keeps j in [i, i+4] ->
    5n - (4+3+2+1) pieces."""
    n_tiles = 8
    data = np.arange((64 * n_tiles) ** 2, dtype=np.float32).reshape(
        64 * n_tiles, 64 * n_tiles
    )
    pieces = split_pieces(data, 64, 64, 40000)
    expected = 5 * n_tiles - 10
    assert pieces.shape == (expected, 1, 64, 64)
    # first piece is the top-left tile
    np.testing.assert_array_equal(pieces[0, 0], data[:64, :64])


def test_split_pieces_pads_to_multiple():
    data = np.ones((100, 100), np.float32)
    pieces = split_pieces(data, 64, 64, 40000)
    # padded to 128 -> 2x2 tiles, band keeps all 3 upper tiles
    assert pieces.shape == (3, 1, 64, 64)
    # padding region is zero
    assert pieces[-1, 0, -1, -1] == 0.0


def test_inject_noise_deno():
    rng = np.random.default_rng(0)
    target = rng.normal(size=(10, 1, 64, 64)).astype(np.float32)
    pinv, samp = inject_noise(target, "deno", 0.1, seed=7)
    assert pinv.shape == target.shape
    assert samp.shape == (10, 64 * 64)
    # identity H: pinv == y; noise level approx sigma
    np.testing.assert_allclose(
        pinv.reshape(10, -1), samp, atol=1e-6
    )
    resid = pinv - target
    np.testing.assert_allclose(resid.std(), 0.1, atol=0.01)
    # seeded: same seed -> identical cache
    pinv2, _ = inject_noise(target, "deno", 0.1, seed=7)
    np.testing.assert_array_equal(pinv, pinv2)


def test_datamodule_end_to_end(fixture_mcool, tmp_path):
    path, truth = fixture_mcool
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Datasets", "Human"), exist_ok=True)
    os.link(path, os.path.join(root, "Datasets", "Human", "cell1_synth.mcool"))

    dm = HiCDataModule(
        batch_size=4, cell_line="Human", cell_No=1, sigma_0=0.1, deg="deno",
        root=root, n_chroms=2,  # the synthetic fixture has 2 chromosomes
    )
    dm.prepare_data()
    # cache layout written
    assert os.path.exists(
        os.path.join(dm.dirname, "Splits",
                     "GSE131811_full_chr_1_40000_piece_64.npy")
    )
    ds_files = os.listdir(os.path.join(dm.dirname, "Splits"))
    assert len(ds_files) == 2 * 3

    # idempotent: second call must not rebuild (compare mtimes)
    probe = os.path.join(dm.dirname, "Splits",
                         "GSE131811_full_chr_1_40000_piece_64.npy")
    mtime = os.path.getmtime(probe)
    dm.prepare_data()
    assert os.path.getmtime(probe) == mtime

    dm.setup(1)
    loader = dm.test_dataloader()
    batches = list(loader)
    assert len(batches) >= 1
    data, target, samp, info = batches[0]
    assert data.shape[1:] == (64, 64, 1)  # NHWC out
    assert target.shape == data.shape
    assert np.all(info == 1)
    assert target.min() >= -1.0 and target.max() <= 1.0


def test_loader_shuffle_determinism():
    class FakeDS:
        def __init__(self):
            self.data = np.arange(40, dtype=np.float32).reshape(10, 1, 2, 2)
            self.target = self.data.copy()
            self.samp = self.data.reshape(10, -1)
            self.info = np.arange(10)

        def __len__(self):
            return 10

    a = NumpyLoader(FakeDS(), 4, shuffle=True, seed=3)
    b = NumpyLoader(FakeDS(), 4, shuffle=True, seed=3)
    for (xa, *_), (xb, *_) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    # next epoch reshuffles
    first_epoch = [x.copy() for x, *_ in NumpyLoader(FakeDS(), 10, shuffle=True, seed=3)]
    ld = NumpyLoader(FakeDS(), 10, shuffle=True, seed=3)
    e1 = [x.copy() for x, *_ in ld]
    e2 = [x.copy() for x, *_ in ld]
    assert not np.array_equal(e1[0], e2[0])


def test_splits_constants():
    assert sorted(
        HUMAN_SPLITS["train"] + HUMAN_SPLITS["val"] + HUMAN_SPLITS["test"]
    ) == list(range(1, 23))
    assert DROS_SPLITS["test"] == [1, 2, 3, 4, 5, 6]


def test_dros_datamodule(tmp_path):
    """Drosophila module: 6 chromosomes, train=[5] val=[2] test=[1..6] splits."""
    from hicdiff_tpu.data.datamodule import GSE131811Module

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Datasets", "Drosophila"), exist_ok=True)
    path = os.path.join(root, "Datasets", "Drosophila", "cell1_synth.mcool")
    make_fixture(path, bins_per_chrom=(80, 72, 64, 72, 80, 64))

    dm = GSE131811Module(batch_size=8, cell_No=1, sigma_0=0.1, root=root)
    assert dm.n_chroms == 6
    assert dm.splits["train"] == [5] and dm.splits["val"] == [2]
    dm.prepare_data()
    dm.setup("fit")
    assert len(dm.train_set) > 0 and len(dm.val_set) > 0
    assert set(np.unique(dm.train_set.info)) == {5}
    dm.setup("test")
    assert set(np.unique(dm.test_set.info)) == {1, 2, 3, 4, 5, 6}


def test_tensorh_noisy_helpers():
    """tensorH numpy noise injectors (PrepareData_tensorH.py:22-58)."""
    from hicdiff_tpu.data.preprocess import noisy

    rng = np.random.default_rng(0)
    img = rng.random((40, 40))
    g = noisy("gauss", img, seed=1)
    assert g.shape == img.shape
    # additive N(0, sqrt(0.1)) noise
    assert 0.2 < np.std(g - img) < 0.45
    sp = noisy("s&p", img, seed=1)
    assert ((sp == 1) | (sp == 0) | (sp == img)).all()
    # amount=0.004, half salt half pepper -> ~4 coords changed per mode
    assert 1 <= (sp != img).sum() <= 16
    po = noisy("poisson", img * 10, seed=1)
    assert (po >= img * 10 - 1e-9).all()  # poisson(lam>=0) adds >= 0
    spk = noisy("speckle", img, seed=1)
    assert spk.shape == img.shape and np.isfinite(spk).all()
    # deterministic per seed
    np.testing.assert_array_equal(noisy("gauss", img, seed=7),
                                  noisy("gauss", img, seed=7))
    with pytest.raises(ValueError):
        noisy("bogus", img)
