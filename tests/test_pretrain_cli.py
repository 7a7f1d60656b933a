"""pretrain.py driver tests (in-process, tiny backbone).

The reference's nine pretrain/train_*.py clones train fixed-size models and
cannot resume (each script is init -> fit -> save, e.g.
/root/reference/pretrain/train_unet_Diff_sr3.py:63-76); pretrain.py adds
--resume with the same checkpoint plumbing train.py uses. Run in-process
with the zoo registry monkeypatched to a 1-block hicedrn so the CPU mesh
compiles in seconds.
"""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.make_fixture_mcool import make_fixture


@pytest.fixture()
def pretrain_root(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Datasets", "Human"))
    make_fixture(
        os.path.join(root, "Datasets", "Human", "cell1_synth.mcool"),
        bins_per_chrom=tuple([64] * 22),
    )
    return root


def _run_pretrain(monkeypatch, argv):
    import pretrain
    from hicdiff_tpu.models.hicedrn import HicedrnDiff

    monkeypatch.setitem(
        pretrain.MODELS, "hicedrn",
        lambda sc, dt: HicedrnDiff(self_condition=sc, dtype=dt,
                                   number_resnet=1, features=32),
    )
    monkeypatch.setattr(sys, "argv", ["pretrain.py"] + argv)
    pretrain.main()


def test_pretrain_resume(pretrain_root, monkeypatch, capsys):
    """--resume restores params/opt_state/step from a finished run's
    checkpoint and continues the step counter (disjoint PRNG fold-ins)."""
    base = ["--model", "hicedrn", "--engine", "cond", "--data", "linear",
            "-e", "1", "-b", "8", "-s", "0.1", "--timestep", "8",
            "--schedule", "sigmoid", "--root", pretrain_root]
    _run_pretrain(monkeypatch, base)
    ckpt = os.path.join(
        pretrain_root, "Model_Weights",
        "finalg_40000_c64_s64_Human1_hicedrn_cond_linear_l2_sig.msgpack",
    )
    assert os.path.exists(ckpt)

    _run_pretrain(monkeypatch, base + ["--resume", ckpt])
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 0" not in out

    log = os.path.join(
        pretrain_root, "logs",
        "pretrain_hicedrn_cond_linear_l2_sig_cell1.jsonl",
    )
    recs = [json.loads(l) for l in open(log)]
    assert len(recs) >= 2  # first run + resumed run both logged an epoch
    import numpy as np

    assert all(np.isfinite(r["valid/loss"]) for r in recs)
