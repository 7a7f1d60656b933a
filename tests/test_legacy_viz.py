"""Legacy utils + visualization panels."""
import os

import numpy as np

from hicdiff_tpu.metrics.viz import save_comparison_panel, save_outputs_panel
from hicdiff_tpu.utils.legacy import split_pieces_diagonal, split_to_40


def test_split_pieces_diagonal():
    data = np.arange(100 * 100, dtype=np.float32).reshape(100, 100)
    pieces = split_pieces_diagonal(data, 40, 20)
    assert pieces.shape == (3, 1, 40, 40)
    np.testing.assert_array_equal(pieces[0, 0], data[:40, :40])
    np.testing.assert_array_equal(pieces[1, 0], data[20:60, 20:60])


def test_split_to_40():
    mats = np.arange(2 * 80 * 80, dtype=np.float32).reshape(2, 1, 80, 80)
    out = split_to_40(mats)
    assert out.shape == (8, 1, 40, 40)
    np.testing.assert_array_equal(out[0, 0], mats[0, 0, :40, :40])
    np.testing.assert_array_equal(out[3, 0], mats[0, 0, 40:, 40:])


def test_save_panels(tmp_path):
    rng = np.random.default_rng(0)
    p = save_comparison_panel(
        {"A": rng.uniform(size=(32, 32)), "B": rng.uniform(size=(32, 32))},
        str(tmp_path / "panel.png"),
    )
    assert os.path.getsize(p) > 1000

    outdir = tmp_path / "outs"
    os.makedirs(outdir)
    for name in ("noisy", "target", "predict"):
        np.save(outdir / f"{name}.npy", rng.uniform(-1, 1, (3, 1, 16, 16)))
    p2 = save_outputs_panel(str(outdir), str(tmp_path / "qa.png"), index=1)
    assert os.path.getsize(p2) > 1000
