"""Subprocess smoke tests for the CLIs on a CPU-only interpreter.

The session interpreter auto-registers the remote TPU backend; subprocesses
bypass it with PALLAS_AXON_POOL_IPS='' + JAX_PLATFORMS=cpu so the CLI smoke
tests run hermetically on an 8-device virtual CPU mesh. A tiny hicedrn
(--blocks 1 --features 32) keeps CPU compute trivial.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.make_fixture_mcool import make_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("HICDIFF_TEST_TPU", None)
    return env


def run(args, **kw):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=cpu_env(),
        capture_output=True, text=True, timeout=1200, **kw,
    )


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    os.makedirs(os.path.join(root, "Datasets", "Human"))
    # 22 tiny chromosomes so the reference splits all resolve
    make_fixture(
        os.path.join(root, "Datasets", "Human", "cell1_synth.mcool"),
        bins_per_chrom=tuple([64] * 22),
    )
    return root


def test_train_and_inference_cli(cli_root):
    """train.py -u 0 one epoch, then inference.py -u 0 over the test split."""
    r = run([
        "train.py", "-u", "0", "-e", "1", "-b", "8", "-n", "1", "-l", "Human",
        "-s", "0.1", "--root", cli_root, "--timestep", "8",
        "--schedule", "sigmoid", "--blocks", "1", "--features", "32",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(
        cli_root, "Model_Weights",
        "bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack",
    )
    assert os.path.exists(ckpt)
    logs = os.path.join(cli_root, "logs", "train_HiCedrn_cond_l2_sig_cell1.jsonl")
    rec = json.loads(open(logs).read().strip().split("\n")[-1])
    assert np.isfinite(rec["train/loss"]) and np.isfinite(rec["valid/loss"])

    r = run([
        "inference.py", "-u", "0", "-b", "8", "-n", "1", "-l", "Human",
        "-s", "0.1", "--root", cli_root, "--timestep", "8",
        "--schedule", "sigmoid", "--blocks", "1", "--features", "32",
        "--weights", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    outdir = os.path.join(
        cli_root, "Outputs_diff", "hicedrn_l2_sigHuman1_deno_0.1_test_cond"
    )
    for name in ("target", "noisy", "predict", "inds"):
        assert os.path.exists(os.path.join(outdir, f"{name}.npy"))
    pred = np.load(os.path.join(outdir, "predict.npy"))
    assert pred.ndim == 4 and np.isfinite(pred).all()
    assert "metrics:" in r.stdout


def test_bench_cli_json_contract():
    """bench.py must print exactly one JSON line with the required keys."""
    r = run(["bench.py", "--steps", "2", "--batch", "1", "--fp32"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().split("\n") if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
