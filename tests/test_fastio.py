"""Native fast COO I/O: parity with numpy loadtxt/savetxt and speed sanity."""
import os
import time

import numpy as np
import pytest

from hicdiff_tpu.data.fastio import (
    load_coo_txt,
    native_available,
    save_coo_txt,
)


def test_native_builds():
    assert native_available(), "g++ build of native/fastcoo.cpp failed"


def test_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    data = np.stack(
        [
            rng.integers(0, 10**9, 1000).astype(float),
            rng.integers(0, 10**9, 1000).astype(float),
            rng.uniform(0, 5, 1000),
        ],
        axis=1,
    )
    p = str(tmp_path / "coo.txt")
    save_coo_txt(p, data)
    back = load_coo_txt(p)
    np.testing.assert_allclose(back, data, rtol=1e-15)
    # numpy can read our format
    np.testing.assert_allclose(np.loadtxt(p).reshape(-1, 3), data, rtol=1e-15)


def test_roundtrip_int(tmp_path):
    data = np.array([[0, 40000, 7], [40000, 80000, 3]], dtype=float)
    p = str(tmp_path / "cnt.txt")
    save_coo_txt(p, data, int_value=True)
    text = open(p).read()
    assert text == "0\t40000\t7\n40000\t80000\t3\n"
    np.testing.assert_array_equal(load_coo_txt(p), data)


def test_reads_reference_format(tmp_path):
    """Parses the reference's to_csv output (float coords, blank-line tolerant)."""
    p = str(tmp_path / "ref.txt")
    with open(p, "w") as f:
        f.write("0\t0\t1.5\n40000\t80000\t0.25\n\n120000\t120000\t2\n")
    out = load_coo_txt(p)
    assert out.shape == (3, 3)
    np.testing.assert_allclose(out[1], [40000, 80000, 0.25])


def test_empty_file(tmp_path):
    p = str(tmp_path / "empty.txt")
    open(p, "w").close()
    assert load_coo_txt(p).shape == (0, 3)


@pytest.mark.skipif(not native_available(), reason="no native lib")
def test_native_faster_than_numpy(tmp_path):
    rng = np.random.default_rng(1)
    n = 200_000
    data = np.stack(
        [
            rng.integers(0, 10**9, n).astype(float),
            rng.integers(0, 10**9, n).astype(float),
            rng.uniform(0, 5, n),
        ],
        axis=1,
    )
    p = str(tmp_path / "big.txt")
    save_coo_txt(p, data)
    t0 = time.time()
    load_coo_txt(p)
    t_native = time.time() - t0
    t0 = time.time()
    np.loadtxt(p)
    t_numpy = time.time() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
