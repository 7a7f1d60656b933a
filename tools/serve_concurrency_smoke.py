"""Production-shape serve concurrency smoke on REAL hardware (round-5 ask 6).

tests/test_serve.py proves the daemon's serialization logic under real
threads at toy shape on CPU; this tool proves it at PRODUCTION shape on the
real chip: concurrent socket clients firing batch-sized requests against the
live daemon must produce outputs byte-equal to a serial replay of the same
requests on a fresh daemon (same seed -> same rng stream; the lock serializes
device work, so processing order fully determines outputs).

Phases (sequential — ONE daemon at a time on the single shared chip,
CLAUDE.md backend rules):
  1. `-u 1` DDRM daemon, batch 64: two clients interleave 64-measurement
     (4096-dim deno) restoration requests.
  2. `-u 0` conditional daemon (--t-start auto --sampling-steps 4, the
     deterministic DDIM config): two clients interleave 64-patch requests.

For each phase: run concurrent, record the observed processing order
(responses are serialized by the daemon lock, so client completion order ==
processing order), restart the daemon fresh, replay the identical requests
serially in that order, and compare output arrays bit-for-bit.

Usage:
  python tools/serve_concurrency_smoke.py --ddrm-weights <uncond_ckpt> \
      --cond-weights <cond_ckpt> [--sigma 0.1] [--batch 64]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hicdiff_tpu.serve import request  # noqa: E402  (client side only: no jax)


def start_daemon(args, sock, log_path, timeout=2400.0):
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve.py"), "--socket", sock]
        + args,
        cwd=REPO, stdout=open(log_path, "a"), stderr=subprocess.STDOUT,
    )
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(
                f"daemon exited rc={proc.returncode}; see {log_path}"
            )
        try:
            if request(sock, {"id": -1, "op": "ping"}, timeout=10).get("ok"):
                return proc
        except (FileNotFoundError, ConnectionRefusedError, OSError):
            time.sleep(2.0)
    proc.kill()
    raise TimeoutError(f"daemon not ready after {timeout}s; see {log_path}")


def stop_daemon(proc, sock):
    try:
        request(sock, {"id": -2, "op": "shutdown"}, timeout=60)
    except Exception:
        pass
    try:
        proc.wait(timeout=60)
    except Exception:
        proc.kill()


def run_phase(name, daemon_args, inputs, workdir):
    """inputs: {req_name: np.ndarray}. Returns per-request wall seconds."""
    sock = os.path.join(workdir, f"{name}.sock")
    log = os.path.join(workdir, f"daemon_{name}.log")

    # requests on disk
    reqs = {}
    for rname, arr in inputs.items():
        src = os.path.join(workdir, f"{name}_{rname}.npy")
        np.save(src, arr)
        reqs[rname] = src

    # ---- concurrent pass
    print(f"[{name}] starting daemon (concurrent pass)...", flush=True)
    proc = start_daemon(daemon_args, sock, log)
    done, errors = [], []
    lock = threading.Lock()

    def client(cname, rnames):
        try:
            for rname in rnames:
                out = os.path.join(workdir, f"{name}_{rname}_conc.npy")
                t0 = time.time()
                resp = request(
                    sock,
                    {"id": rname, "op": "denoise", "npy": reqs[rname],
                     "out": out},
                    timeout=1200,
                )
                dt = time.time() - t0
                assert resp.get("ok"), resp
                with lock:
                    done.append((time.time(), rname, dt,
                                 resp.get("elapsed_s")))
                print(f"[{name}] client {cname} <- {rname}: wall {dt:.2f}s "
                      f"(service {resp.get('elapsed_s')}s)", flush=True)
        except Exception as e:
            errors.append(f"{cname}: {type(e).__name__}: {e}")

    rnames = sorted(inputs)
    half = (len(rnames) + 1) // 2
    threads = [
        threading.Thread(target=client, args=("A", rnames[:half])),
        threading.Thread(target=client, args=("B", rnames[half:])),
    ]
    t_conc = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_conc = time.time() - t_conc
    stop_daemon(proc, sock)
    if errors:
        raise RuntimeError(f"[{name}] concurrent clients failed: {errors}")
    order = [rname for _, rname, _, _ in sorted(done)]
    print(f"[{name}] concurrent pass done in {t_conc:.1f}s; "
          f"processing order: {order}", flush=True)

    # ---- serial replay on a FRESH daemon (fresh rng count), observed order
    print(f"[{name}] starting fresh daemon (serial replay)...", flush=True)
    proc = start_daemon(daemon_args, sock, log)
    for rname in order:
        out = os.path.join(workdir, f"{name}_{rname}_serial.npy")
        resp = request(
            sock,
            {"id": rname, "op": "denoise", "npy": reqs[rname], "out": out},
            timeout=1200,
        )
        assert resp.get("ok"), resp
    stop_daemon(proc, sock)

    # ---- byte equality
    for rname in order:
        a = np.load(os.path.join(workdir, f"{name}_{rname}_conc.npy"))
        b = np.load(os.path.join(workdir, f"{name}_{rname}_serial.npy"))
        if not (a.shape == b.shape and np.array_equal(a, b)):
            raise AssertionError(
                f"[{name}] {rname}: concurrent != serial replay "
                f"(max abs diff {np.max(np.abs(a - b))})"
            )
    print(f"[{name}] OK: all {len(order)} concurrent responses byte-equal "
          "to the serial replay", flush=True)
    return [dt for _, _, dt, _ in sorted(done)]


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ddrm-weights", default=None)
    ap.add_argument("--cond-weights", default=None)
    ap.add_argument("--sigma", type=float, default=0.1)
    ap.add_argument("--schedule-cond", default="sigmoid")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--requests-per-client", type=int, default=2)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--toy", action="store_true",
                    help="CPU debug mode: tiny random-init backbone "
                         "(blocks=2, features=16, T=8) at batch 4 — for "
                         "rehearsing the harness without the chip (set "
                         "HICDIFF_PLATFORM=cpu)")
    args = ap.parse_args()
    if not args.toy and not (args.ddrm_weights and args.cond_weights):
        ap.error("--ddrm-weights/--cond-weights required (or pass --toy)")
    toy_args, toy_cond_args = [], []
    if args.toy:
        args.batch = 4
        toy_args = ["--blocks", "2", "--features", "16", "--timestep", "8",
                    "--scan-chunk", "0"]
        toy_cond_args = toy_args + ["--t-start", "2"]
    workdir = args.workdir or tempfile.mkdtemp(prefix="hicdiff_serve_smoke_")
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    n_req = 2 * args.requests_per_client

    # phase 1: DDRM, 64-measurement (4096-dim) requests at batch size
    ddrm_inputs = {
        f"r{i}": np.clip(
            rng.normal(0, 0.3, (args.batch, 64 * 64)), -1, 1
        ).astype(np.float32)
        for i in range(n_req)
    }
    ddrm_daemon = ["-u", "1", "-s", str(args.sigma), "--schedule", "linear",
                   "--batch", str(args.batch)]
    ddrm_daemon += (toy_args + ["--t-start", "auto"]) if args.toy else (
        ["--weights", args.ddrm_weights, "--t-start", "auto", "--bf16"])
    ddrm_times = run_phase("ddrm", ddrm_daemon, ddrm_inputs, workdir)

    # phase 2: conditional truncated-DDIM (deterministic), 64-patch requests
    cond_inputs = {
        f"r{i}": np.clip(
            rng.normal(0, 0.3, (args.batch, 1, 64, 64)), -1, 1
        ).astype(np.float32)
        for i in range(n_req)
    }
    cond_daemon = ["-s", str(args.sigma), "--schedule", args.schedule_cond,
                   "--batch", str(args.batch)]
    cond_daemon += (toy_cond_args + ["--sampling-steps", "2"]) if args.toy else (
        ["--weights", args.cond_weights, "--t-start", "auto",
         "--sampling-steps", "4", "--bf16"])
    cond_times = run_phase("cond", cond_daemon, cond_inputs, workdir)

    print(json.dumps({
        "ok": True,
        "batch": args.batch,
        "ddrm_request_walls_s": [round(t, 2) for t in ddrm_times],
        "cond_request_walls_s": [round(t, 2) for t in cond_times],
        "workdir": workdir,
    }))


if __name__ == "__main__":
    main()
