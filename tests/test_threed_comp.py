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
    written, dropped = export_blocks(
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
    written, dropped = export_blocks(
        "predict", arr, np.arange(5), str(tmp_path), threshold=0.3,
        max_blocks=2, diagonal_only=False,
    )
    assert written == 2 and dropped == 3


def test_diagonal_only_filter(tmp_path):
    arr = np.concatenate([_patches(2), _patches(2, diag=False)])
    written, dropped = export_blocks(
        "noisy", arr, np.arange(4), str(tmp_path), threshold=0.3,
        max_blocks=0, diagonal_only=True,
    )
    assert written == 2 and dropped == 2


def test_nhwc_input_accepted(tmp_path):
    arr = np.transpose(_patches(3), (0, 2, 3, 1))  # NHWC
    written, dropped = export_blocks(
        "target", arr, np.arange(3), str(tmp_path), threshold=0.3,
        max_blocks=0, diagonal_only=False,
    )
    assert written == 3 and dropped == 0
