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


def test_concurrent_clients_match_serial_replay(tmp_path):
    """The RLock guarantee under real concurrency (not just architecture):
    N socket clients interleaving denoise/denoise_mcool/ping plus a direct
    denoise_patches embedder produce responses byte-equal to a serial replay
    of the same requests, and the service rng counter advances exactly once
    per dispatched device batch."""
    import math
    import sys
    import time

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from make_fixture_mcool import make_fixture

    from hicdiff_tpu.data.mcool import McoolFile

    def make_service():
        # truncated DDIM eta=0: fully deterministic, so correctness under
        # concurrency is exactly byte-equality with the serial replay
        return DenoiseService(
            None, sigma=0.1, schedule="sigmoid", timesteps=8, t_start=2,
            sampling_steps=2, batch=4, bf16=False, scan_chunk=0, blocks=2,
            features=16, warmup=True, seed=0,
        )

    svc = make_service()
    sock = str(tmp_path / "conc.sock")
    t = threading.Thread(target=serve_forever, args=(svc, sock), daemon=True)
    t.start()
    for _ in range(100):
        try:
            if request(sock, {"id": -1, "op": "ping"}).get("ok"):
                break
        except (FileNotFoundError, ConnectionRefusedError):
            time.sleep(0.05)

    n_threads, n_patches = 5, 5  # 5 patches -> 2 padded batches of 4 each
    inputs = [
        np.clip(
            np.random.default_rng(100 + i).normal(0, 0.3, (n_patches, 1, 64, 64)),
            -1, 1,
        ).astype(np.float32)
        for i in range(n_threads)
    ]
    mcool_src = str(tmp_path / "cell.mcool")
    make_fixture(mcool_src, bins_per_chrom=(96, 80), res=40000, seed=4)

    results, errors = {}, []

    def socket_client(i):
        try:
            assert request(sock, {"id": i, "op": "ping"})["ok"]
            src = str(tmp_path / f"noisy_{i}.npy")
            np.save(src, inputs[i])
            resp = request(sock, {"id": i, "op": "denoise", "npy": src},
                           timeout=600)
            assert resp["ok"], resp
            results[i] = np.load(resp["out"])
            assert request(sock, {"id": i, "op": "ping"})["ok"]
        except Exception as e:  # pragma: no cover - surfaced in main thread
            errors.append(e)

    def mcool_client():
        try:
            resp = request(
                sock,
                {"id": 90, "op": "denoise_mcool", "mcool": mcool_src,
                 "out_mcool": str(tmp_path / "conc_out.mcool")},
                timeout=600,
            )
            assert resp["ok"], resp
            results["mcool"] = resp["out_mcool"]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def embedder_client():
        try:  # direct in-process use of the same service object
            results["embed"] = svc.denoise_patches(inputs[0])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    count0 = svc._count
    threads = [threading.Thread(target=socket_client, args=(i,))
               for i in range(n_threads)]
    threads += [threading.Thread(target=mcool_client),
                threading.Thread(target=embedder_client)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    request(sock, {"id": -2, "op": "shutdown"})
    t.join(timeout=10)
    assert not errors, errors

    # ---- serial replay on a fresh identically-seeded service
    replay = make_service()
    r0 = replay._count
    for i in range(n_threads):
        serial_out = replay.denoise_patches(inputs[i])
        assert results[i].tobytes() == serial_out.tobytes(), f"client {i}"
    serial_mcool = str(tmp_path / "serial_out.mcool")
    resp = replay._denoise_mcool(
        {"mcool": mcool_src, "out_mcool": serial_mcool}, rid=0, t0=0.0
    )
    assert resp["ok"]
    serial_embed = replay.denoise_patches(inputs[0])
    assert results["embed"].tobytes() == serial_embed.tobytes()

    # rng counter advanced exactly once per dispatched batch, concurrent ==
    # serial (the embedder + 5 clients: 2 chunks each; mcool: 1 per chrom)
    explicit_chunks = (n_threads + 1) * math.ceil(n_patches / svc.batch)
    assert replay._count - r0 == svc._count - count0
    assert svc._count - count0 >= explicit_chunks

    # the concurrently-produced mcool holds the same denoised matrices
    mc_c, mc_s = (McoolFile(p, 40000)
                  for p in (results["mcool"], serial_mcool))
    assert mc_c.chromnames == mc_s.chromnames
    for name in mc_c.chromnames:
        a, b = mc_c.fetch(name), mc_s.fetch(name)
        np.testing.assert_array_equal(a.balanced, b.balanced)


def test_percentile_override_semantics(tmp_path):
    """percentile=None adopts the checkpoint's stored value; an explicit
    value is honored over it (advisor round-3 finding: the old code silently
    replaced explicit overrides with the stored value AFTER warning that the
    override would be used)."""
    import jax
    import jax.numpy as jnp

    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from hicdiff_tpu.models.hicedrn import HicedrnDiff
    from hicdiff_tpu.train.checkpoint import save_checkpoint

    model = HicedrnDiff(self_condition=True, number_resnet=2, features=16)
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=8, loss_type="l2",
        beta_schedule="sigmoid", mode="cond",
    )
    params = engine.init_params(jax.random.PRNGKey(0))
    ck = str(tmp_path / "ck.msgpack")
    save_checkpoint(ck, params, run_config=dict(
        sigma=0.1, schedule="sigmoid", mode="cond", timestep=8,
        percentile=99.0,
    ))

    kw = dict(sigma=0.1, schedule="sigmoid", timesteps=8, t_start=2, batch=2,
              bf16=False, scan_chunk=0, blocks=2, features=16, warmup=False)
    # no weights: the 99.99 train.py default
    assert DenoiseService(None, **kw).percentile == 99.99
    # weights, no explicit percentile: adopt the stored value
    assert DenoiseService(ck, **kw).percentile == 99.0
    # explicit override wins over the stored value
    assert DenoiseService(ck, percentile=98.5, **kw).percentile == 98.5


def test_ddrm_mode_service():
    """mode='ddrm' serves the -u 1 restoration path: image-shaped deno
    measurements round-trip in both layouts, raw 2-D (n, d) measurements are
    accepted directly, and cond-mode rejects 2-D input."""
    service = DenoiseService(
        None, mode="ddrm", sigma=0.1, timesteps=8, t_start=3, batch=4,
        bf16=False, scan_chunk=2, blocks=2, features=16, warmup=True,
    )
    assert service.mode == "ddrm" and service.t_start == 3
    x = np.clip(
        np.random.default_rng(2).normal(0, 0.3, (3, 1, 64, 64)), -1, 1
    ).astype(np.float32)
    out = service.denoise_patches(x)
    assert out.shape == x.shape and np.isfinite(out).all()
    # raw measurement layout (deno: d = 64*64) -> restored NHWC images
    out2 = service.denoise_patches(x.reshape(3, -1))
    assert out2.shape == (3, 64, 64, 1) and np.isfinite(out2).all()
    # the two input layouts are the same measurement: same restoration up to
    # the service rng position (count advanced once per batch)
    resp = service.handle({"id": 1, "op": "ping"})
    assert resp["ok"] and resp["mode"] == "ddrm" and resp["t_start"] == 3


def test_ddrm_mode_auto_tstart_and_uncond_checkpoint(tmp_path):
    """t_start='auto' derives the exact-marginal timestep from sigma;
    an uncond checkpoint loads without a sigma warning (benign for uncond,
    checkpoint._sigma_irrelevant)."""
    import jax

    from hicdiff_tpu.models.hicedrn import HicedrnDiff
    from hicdiff_tpu.sampling.ddrm import ddrm_truncation_timestep
    from hicdiff_tpu.diffusion.schedules import get_beta_schedule
    from hicdiff_tpu.train.checkpoint import save_checkpoint

    model = HicedrnDiff(self_condition=False, number_resnet=2, features=16)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32),
        np.zeros((1,), np.int32), None,
    )["params"]
    ck = str(tmp_path / "uncond.msgpack")
    save_checkpoint(ck, params, run_config=dict(
        sigma=0.5, schedule="linear", mode="uncond", timestep=1000,
    ))
    service = DenoiseService(
        ck, mode="ddrm", sigma=0.1, timesteps=1000, t_start="auto",
        sampling_steps=2, batch=2, bf16=False, scan_chunk=0, blocks=2,
        features=16, warmup=False,
    )
    betas = get_beta_schedule("linear", beta_start=0.0001, beta_end=0.02,
                              num_diffusion_timesteps=1000)
    assert service.t_start == ddrm_truncation_timestep(betas, 0.1) == 27


def test_ddrm_mode_nullspace_operator_service():
    """A non-identity operator whose measurement is not image-sized (sr4):
    warmup must compile with a measurement-shaped batch (regression — the
    image-shaped warmup crashed the daemon at startup for every such
    operator), t_start='auto' falls back to the full chain (null space),
    raw (n, d) measurements restore to images, and image-shaped input gets
    a clear error instead of a broadcast shape crash."""
    service = DenoiseService(
        None, mode="ddrm", deg="sr4", sigma=0.1, timesteps=1000,
        t_start="auto", sampling_steps=2, batch=4, bf16=False, scan_chunk=0,
        blocks=2, features=16, warmup=True,
    )
    assert service.t_start is None  # null space -> full chain
    d = service._meas_dim
    assert d == 64 * 64 // 16
    y = np.clip(
        np.random.default_rng(3).normal(0, 0.3, (3, d)), -1, 1
    ).astype(np.float32)
    out = service.denoise_patches(y)
    assert out.shape == (3, 64, 64, 1) and np.isfinite(out).all()
    with pytest.raises(ValueError, match="measurements of dimension"):
        service.denoise_patches(np.zeros((2, 64, 64, 1), np.float32))


def test_cond_mode_rejects_measurement_input(service):
    with pytest.raises(ValueError):
        service.denoise_patches(np.zeros((2, 64 * 64), np.float32))


def test_ddrm_mode_denoise_mcool(tmp_path):
    """The full-file mcool flow works through the ddrm service too (the
    restoration-as-a-service deployment of the -u 1 path): .mcool in ->
    restored .mcool out via the shared _denoise_mcool handler."""
    pytest.importorskip("h5py")
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from make_fixture_mcool import make_fixture

    from hicdiff_tpu.data.mcool import McoolFile

    service = DenoiseService(
        None, mode="ddrm", sigma=0.1, timesteps=8, t_start=2, batch=4,
        bf16=False, scan_chunk=0, blocks=2, features=16, warmup=False,
    )
    src = str(tmp_path / "cell.mcool")
    make_fixture(src, bins_per_chrom=(96, 80), res=40000, seed=6)
    dst = str(tmp_path / "cell_restored.mcool")
    resp = service.handle(
        {"id": 20, "op": "denoise_mcool", "mcool": src, "out_mcool": dst}
    )
    assert resp["ok"], resp
    mc = McoolFile(dst, 40000)
    px = mc.fetch(mc.chromnames[0])
    assert px.start1.size > 0 and np.isfinite(px.balanced).all()
