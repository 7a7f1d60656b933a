"""The full-scale fixture generator (tools/make_fullscale_fixture.py) must be
schema-compatible with the production prep path — same contract the tiny test
fixture satisfies (PrepareData_linear.py:129-213 semantics), just at real
hg19-like bin counts. Tested here at small bin counts so CI stays fast."""
import numpy as np
import pytest

from hicdiff_tpu.data.datamodule import GSE130711Module
from hicdiff_tpu.data.mcool import McoolFile
from tools.make_fullscale_fixture import HG19_BINS_40KB, band_pixels, make_fullscale


def test_hg19_bin_table_is_fullscale():
    # the north-star workload is ~5,400 band patches over 22 chromosomes
    assert len(HG19_BINS_40KB) == 22
    assert HG19_BINS_40KB[0] == 6232  # chr1 @ 40kb
    assert 70_000 < sum(HG19_BINS_40KB) < 75_000


def test_band_pixels_upper_triangle_and_decay():
    rng = np.random.default_rng(0)
    r, c, v = band_pixels(512, rng, band=32)
    assert (c >= r).all() and (c - r < 32).all()
    assert (v > 0).all()
    # diagonal fully populated (prep drops zero-diagonal rows)
    assert np.intersect1d(r[c == r], np.arange(512)).size == 512
    # contact frequency decays with genomic distance
    near = v[(c - r) <= 2].mean()
    far = v[(c - r) >= 20].mean()
    assert near > 3 * far


def test_fullscale_mcool_flows_production_prep(tmp_path):
    path = str(tmp_path / "Datasets" / "Human" / "cell1_synth.mcool")
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    make_fullscale(path, bins_per_chrom=[192, 160], seed=3)

    mc = McoolFile(path, 40000)
    assert mc.chromnames == ["chr1", "chr2"]
    px = mc.fetch("chr1")
    assert px.balanced.size > 0 and np.isfinite(px.balanced).all()

    dm = GSE130711Module(
        batch_size=16, deg="deno", sigma_0=0.1, root=str(tmp_path), n_chroms=2
    )
    dm.prepare_data()
    dm.setup(1)
    data, target, samp, info = dm.test_set[0]
    assert data.shape == (1, 64, 64)  # caches stay NCHW; loader converts to NHWC
    assert target.min() >= -1.0 and target.max() <= 1.0
    # noisy input actually differs from the clean target (sigma=0.1 injected)
    assert not np.allclose(data, target)
