"""Serving-daemon tests: protocol, batching/padding, mcool round trip.

Runs the real Unix-socket server in a thread with a tiny random-init backbone
(2 blocks, T=8) on the virtual-CPU mesh.
"""
import json
import threading

import numpy as np
import pytest

from hicdiff_tpu.serve import DenoiseService, request, serve_forever


@pytest.fixture(scope="module")
def service():
    return DenoiseService(
        None, sigma=0.1, schedule="sigmoid", timesteps=8, t_start=2,
        batch=4, bf16=False, scan_chunk=0, blocks=2, features=16,
        warmup=True,
    )


@pytest.fixture()
def server(service, tmp_path):
    sock = str(tmp_path / "hicdiff.sock")
    t = threading.Thread(target=serve_forever, args=(service, sock), daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            if request(sock, {"id": -1, "op": "ping"}).get("ok"):
                break
        except (FileNotFoundError, ConnectionRefusedError):
            time.sleep(0.05)
    yield sock
    request(sock, {"id": -2, "op": "shutdown"})
    t.join(timeout=10)


def test_denoise_patches_padding(service):
    """Non-multiple-of-batch inputs survive the fixed-shape padding in both
    layouts, finite in [-1,1]."""
    x = np.clip(np.random.default_rng(0).normal(0, 0.3, (6, 64, 64, 1)), -1, 1)
    out = service.denoise_patches(x.astype(np.float32))
    assert out.shape == x.shape and np.isfinite(out).all()
    nchw = np.transpose(x, (0, 3, 1, 2)).astype(np.float32)
    out2 = service.denoise_patches(nchw)
    assert out2.shape == nchw.shape
    # same patches, same service PRNG stream position differs — only layout
    # handling is under test here


def test_server_protocol(server, tmp_path):
    resp = request(server, {"id": 7, "op": "ping"})
    assert resp["ok"] and resp["id"] == 7 and resp["t_start"] == 2

    x = np.clip(
        np.random.default_rng(1).normal(0, 0.3, (3, 1, 64, 64)), -1, 1
    ).astype(np.float32)
    src = str(tmp_path / "noisy.npy")
    np.save(src, x)
    resp = request(server, {"id": 8, "op": "denoise", "npy": src})
    assert resp["ok"], resp
    out = np.load(resp["out"])
    assert out.shape == x.shape and np.isfinite(out).all()

    resp = request(server, {"id": 9, "op": "nope"})
    assert not resp["ok"] and "unknown op" in resp["error"]
    resp = request(server, {"id": 10, "op": "denoise", "npy": "/absent.npy"})
    assert not resp["ok"]  # served error, daemon stays alive
    assert request(server, {"id": 11, "op": "ping"})["ok"]


def test_server_denoise_mcool(server, tmp_path):
    """Full-file flow against the synthetic fixture: .mcool in ->
    denoised .mcool out, readable by the pipeline's reader."""
    pytest.importorskip("h5py")
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from make_fixture_mcool import make_fixture

    from hicdiff_tpu.data.mcool import McoolFile

    src = str(tmp_path / "cell.mcool")
    make_fixture(src, bins_per_chrom=(96, 80), res=40000, seed=4)
    dst = str(tmp_path / "cell_denoised.mcool")
    resp = request(
        server,
        {"id": 12, "op": "denoise_mcool", "mcool": src, "out_mcool": dst},
        timeout=600,
    )
    assert resp["ok"], resp
    mc = McoolFile(dst, 40000)
    assert resp["chromosomes"] == mc.chromnames
    px = mc.fetch(mc.chromnames[0])
    assert px.start1.size > 0 and np.isfinite(px.balanced).all()
    assert px.balanced.min() >= 0.0 and px.balanced.max() <= 1.0


def test_cli_client_roundtrip(server):
    """serve.py --client drives the daemon from a subprocess."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "serve.py", "--client", "--socket", server,
         "--request", json.dumps({"id": 1, "op": "ping"})],
        capture_output=True, text=True, cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        ),
    )
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout.strip())["ok"]
