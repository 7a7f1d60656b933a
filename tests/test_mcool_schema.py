"""Schema-variant hardening of the native .mcool reader (round-5 VERDICT ask 4).

`hicdiff_tpu/data/mcool.py` had only ever been validated against this repo's
own fixture writers — a closed loop. These tests pin the reader to the COOLER
SCHEMA's variation surface (the behavior target is the reference's
`cooler.Cooler(...).matrix(balance=True, as_pixels=True).fetch(chrom)`,
PrepareData_linear.py:140-158), by mutating a schema-correct fixture the way
real cooler-written files differ:

  * `pixels/count` as int32 / int64 / float32 / float64 (cooler stores int
    counts by default but float after `cooler zoomify --balance` output or
    float input BEDPE),
  * `chroms/name` as fixed-width bytes (cooler default) vs variable-length
    UTF-8 strings,
  * Ensembl naming without the 'chr' prefix ('1', '2') while the pipeline
    asks for 'chr1' (PrepareData_linear.py:141), and the converse,
  * absent `indexes/` group (an optional acceleration structure; rebuilt
    from bins/pixels by the reader),
  * declared `storage-mode: square` (rejected loudly — the pipeline's
    upper-triangle symmetrization would double-count it),
  * lower-triangle pixel storage (rejected loudly),
  * full prep-path equality across all accepted variants, and a round trip
    through the exporter (`assemble.write_mcool`) back into the full prep.
"""
import os
import shutil

import h5py
import numpy as np
import pytest

from hicdiff_tpu.data.datamodule import GSE130711Module
from hicdiff_tpu.data.mcool import McoolFile

RES = 40000
GRP = f"resolutions/{RES}"


@pytest.fixture()
def base_mcool(tmp_path):
    from make_fixture_mcool import make_fixture

    path = str(tmp_path / "base.mcool")
    make_fixture(path, bins_per_chrom=(96, 80), seed=4)
    return path


def _variant(tmp_path, base, name):
    dst = str(tmp_path / f"{name}.mcool")
    shutil.copy(base, dst)
    return dst


def _fetch_all(path):
    mc = McoolFile(path, RES)
    out = {}
    for c in mc.chromnames:
        c_query = c if c.startswith("chr") else "chr" + c
        px = mc.fetch(c_query)
        out[c_query] = (px.start1, px.start2, px.count, px.balanced)
    return out


def _assert_same(a, b):
    assert a.keys() == b.keys()
    for k in a:
        for x, y in zip(a[k], b[k]):
            np.testing.assert_allclose(x, y, rtol=0, atol=0)


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_count_dtype_variants(tmp_path, base_mcool, dtype):
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, f"count_{np.dtype(dtype).name}")
    with h5py.File(p, "r+") as f:
        counts = f[f"{GRP}/pixels/count"][:]
        del f[f"{GRP}/pixels/count"]
        f.create_dataset(f"{GRP}/pixels/count", data=counts.astype(dtype))
    _assert_same(ref, _fetch_all(p))


def test_str_dtype_chrom_names(tmp_path, base_mcool):
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, "strnames")
    with h5py.File(p, "r+") as f:
        names = [n.decode() for n in f[f"{GRP}/chroms/name"][:]]
        del f[f"{GRP}/chroms/name"]
        f.create_dataset(
            f"{GRP}/chroms/name", data=names, dtype=h5py.string_dtype()
        )
    _assert_same(ref, _fetch_all(p))


def test_ensembl_naming_without_chr_prefix(tmp_path, base_mcool):
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, "ensembl")
    with h5py.File(p, "r+") as f:
        names = [n.decode().removeprefix("chr") for n in f[f"{GRP}/chroms/name"][:]]
        del f[f"{GRP}/chroms/name"]
        f.create_dataset(f"{GRP}/chroms/name", data=np.array(names, dtype="S8"))
    mc = McoolFile(p, RES)
    assert mc.chromnames == ["1", "2"]
    # pipeline-form query resolves; so do the file's own names
    _assert_same(ref, _fetch_all(p))
    assert mc.n_bins("chr1") == mc.n_bins("1") == 96
    np.testing.assert_array_equal(mc.weights("chr2"), mc.weights("2"))
    with pytest.raises(KeyError):
        mc.fetch("chr9")


def test_missing_indexes_group_falls_back_to_scan(tmp_path, base_mcool):
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, "noindexes")
    with h5py.File(p, "r+") as f:
        del f[f"{GRP}/indexes"]
    mc = McoolFile(p, RES)  # chrom_offset rebuilt from bins/chrom
    got = {}
    for c in ("chr1", "chr2"):
        px = mc.fetch(c)  # bin1_offset rebuilt from pixels/bin1_id
        got[c] = (px.start1, px.start2, px.count, px.balanced)
    _assert_same(ref, got)


def test_missing_indexes_with_string_bins_chrom(tmp_path, base_mcool):
    """Some writers store bins/chrom as names instead of integer codes."""
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, "strbins")
    with h5py.File(p, "r+") as f:
        codes = f[f"{GRP}/bins/chrom"][:]
        names = [n.decode() for n in f[f"{GRP}/chroms/name"][:]]
        del f[f"{GRP}/bins/chrom"]
        f.create_dataset(
            f"{GRP}/bins/chrom",
            data=np.array([names[c] for c in codes], dtype="S8"),
        )
        del f[f"{GRP}/indexes"]
    _assert_same(ref, _fetch_all(p))


def test_declared_square_storage_rejected(tmp_path, base_mcool):
    p = _variant(tmp_path, base_mcool, "square")
    with h5py.File(p, "r+") as f:
        f[GRP].attrs["storage-mode"] = "square"
    with pytest.raises(ValueError, match="storage-mode"):
        McoolFile(p, RES)


def test_declared_symmetric_upper_accepted(tmp_path, base_mcool):
    ref = _fetch_all(base_mcool)
    p = _variant(tmp_path, base_mcool, "declared")
    with h5py.File(p, "r+") as f:
        f[GRP].attrs["storage-mode"] = np.bytes_("symmetric-upper")
    _assert_same(ref, _fetch_all(p))


def test_lower_triangle_pixels_rejected(tmp_path, base_mcool):
    p = _variant(tmp_path, base_mcool, "lower")
    with h5py.File(p, "r+") as f:
        b1 = f[f"{GRP}/pixels/bin1_id"][:]
        b2 = f[f"{GRP}/pixels/bin2_id"][:]
        # swap a strict-upper pixel into the lower triangle
        off = np.nonzero(b2 > b1)[0][0]
        b1[off], b2[off] = b2[off], b1[off]
        f[f"{GRP}/pixels/bin1_id"][:] = b1
        f[f"{GRP}/pixels/bin2_id"][:] = b2
    with pytest.raises(ValueError, match="lower-triangle"):
        McoolFile(p, RES).fetch("chr1")


def test_prep_path_equality_across_accepted_variants(tmp_path):
    """The FULL production prep (mcool -> Constraints -> Full_Mats -> Splits)
    must produce byte-identical caches from every accepted schema variant of
    the same underlying data."""
    from make_fixture_mcool import make_fixture

    def prep(tag, mutate):
        root = tmp_path / tag
        mcool = str(root / "Datasets" / "Human" / "cell1_synth.mcool")
        os.makedirs(os.path.dirname(mcool), exist_ok=True)
        make_fixture(mcool, bins_per_chrom=(192, 192), seed=9)
        if mutate:
            mutate(mcool)
        dm = GSE130711Module(
            batch_size=8, deg="deno", sigma_0=0.1, root=str(root), n_chroms=2
        )
        dm.prepare_data()
        dm.setup("all")
        return dm.test_set

    def to_float_noindex(path):
        with h5py.File(path, "r+") as f:
            counts = f[f"{GRP}/pixels/count"][:]
            del f[f"{GRP}/pixels/count"]
            f.create_dataset(
                f"{GRP}/pixels/count", data=counts.astype(np.float64)
            )
            del f[f"{GRP}/indexes"]

    ds_ref = prep("refvar", None)
    ds_alt = prep("altvar", to_float_noindex)
    assert len(ds_ref) == len(ds_alt) > 0
    np.testing.assert_array_equal(ds_ref.target, ds_alt.target)
    np.testing.assert_array_equal(ds_ref.data, ds_alt.data)


def test_exporter_roundtrip_through_full_prep(tmp_path):
    """assemble.write_mcool output -> McoolFile -> full prep: the exporter's
    files are first-class pipeline inputs, not just spot-readable."""
    from hicdiff_tpu.data.assemble import write_mcool

    rng = np.random.default_rng(2)
    mats = {}
    for c, n in ((1, 192), (2, 192)):
        m = rng.poisson(6.0, (n, n)).astype(np.float64)
        m = np.triu(m) + np.triu(m, 1).T  # symmetric
        np.fill_diagonal(m, np.maximum(np.diag(m), 1))  # live diagonal
        mats[c] = m
    root = tmp_path / "export"
    mcool = str(root / "Datasets" / "Human" / "cell1_synth.mcool")
    os.makedirs(os.path.dirname(mcool), exist_ok=True)
    write_mcool(mcool, RES, mats)

    dm = GSE130711Module(
        batch_size=8, deg="deno", sigma_0=0.1, root=str(root), n_chroms=2
    )
    dm.prepare_data()
    dm.setup("all")
    ds = dm.test_set
    assert len(ds) > 0
    assert np.isfinite(ds.target).all()
    assert ds.target.min() >= -1.0 and ds.target.max() <= 1.0
