"""Multi-host (multi-PROCESS) execution of the data-parallel design.

DESIGN.md's parallelism section claimed the single-process design "extends
without code restructuring" to multiple hosts: `make_mesh` builds its 1-D
`data` axis over the GLOBAL `jax.devices()` (which spans processes once
`jax.distributed.initialize` has run), sharding annotations are unchanged,
and the input pipeline becomes per-host slices of the Splits cache. This
module EXECUTES that claim instead of asserting it: a coordinator + worker
process pair (2 processes x 4 virtual CPU devices each) builds the global
8-device mesh, runs the REAL jitted train step (`Trainer._train_step` — the
same compiled function production training uses) with each process feeding
only its `process_index` slice of an actual Splits .npy cache, runs a
truncated conditional sampling chain through `chunked_sampler`, and the
launcher asserts the losses and sampler outputs equal a single-process
8-device run of the identical workload.

What is genuinely multi-host here and what is not:
  * REAL: two OS processes, gloo-backed XLA collectives between them (the
    gradient psum crosses the process boundary), per-process input slices
    assembled into global arrays via jax.make_array_from_process_local_data,
    replicated params placed with the SAME `parallel.mesh.replicate` call the
    single-process path uses (jax places them per process).
  * SIMULATED: the transport. On real TPU pods the same program rides
    ICI/DCN via `jax.distributed.initialize` with TPU topology discovery —
    the CPU backend substitutes gloo over localhost. No code below branches
    on the transport.

Reference contrast: the reference has no distributed support of any kind —
/root/reference/train.py:57 hard-codes `cuda:1`, and no reference component
touches torch.distributed (SURVEY.md §2.9). This axis is the rebuild's own.

Usage:
  python -m hicdiff_tpu.parallel.multihost            # launch 2x4 vs 1x8
  __graft_entry__.dryrun_multihost()                  # driver entry
  HICDIFF_TEST_MULTIHOST=1 pytest tests/test_multihost.py  (opt-in: ~2-4 min
  of subprocess compiles on the 1-core CI host)
"""
from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tiny-but-real workload: hicedrn backbone (2 blocks x 32 features) on the
# fixture's 64x64 Splits patches, T=8 cosine, conditional mode — the same
# engine/trainer classes as production, shrunk so 3 subprocess compiles fit
# a 1-core CPU host in minutes
BLOCKS, FEATURES, TIMESTEPS = 2, 32, 8
GLOBAL_BATCH = 8  # over 8 global devices -> 1 patch/device


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(devices_per_proc: int) -> dict:
    """Subprocess env: pin CPU and provision virtual devices BEFORE backend
    init (XLA_FLAGS is parsed once; replace any stale device-count flag)."""
    env = dict(os.environ)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    return env


# --------------------------------------------------------------------- prep
def prep(workdir: str) -> str:
    """Build a 3-chromosome fixture + run the production prep path once, and
    write a manifest pointing at the train-split Splits .npy files the workers
    will slice per-process. Host-side numpy/h5py only (no jax backend use —
    safe to call from the driver's process)."""
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from make_fixture_mcool import make_fixture

    from hicdiff_tpu.data.datamodule import GSE130711Module

    mcool = os.path.join(workdir, "Datasets", "Human", "cell1_synth.mcool")
    os.makedirs(os.path.dirname(mcool), exist_ok=True)
    make_fixture(mcool, bins_per_chrom=(192, 192, 192), seed=0)
    dm = GSE130711Module(
        batch_size=GLOBAL_BATCH, deg="deno", sigma_0=0.1, root=workdir,
        n_chroms=3,
    )
    dm.prepare_data()
    base = os.path.join(
        dm.dirname, "Splits", "GSE131811_%s_chr_1_40000_piece_64.npy"
    )
    manifest = {
        "noisy": base % "noisy",
        "full": base % "full",
        "batch": GLOBAL_BATCH,
    }
    for p in (manifest["noisy"], manifest["full"]):
        if not os.path.exists(p):
            raise FileNotFoundError(p)
    mpath = os.path.join(workdir, "manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return mpath


# ------------------------------------------------------------------- worker
def worker(rank: int, nprocs: int, devices_per_proc: int, port: int,
           manifest_path: str, out_path: str) -> None:
    """One process of the multi-host run. With nprocs == 1 this is the
    single-process reference (no distributed runtime at all — the exact
    configuration every other test in the repo runs)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=rank,
        )
    from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax.numpy as jnp

    from hicdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from hicdiff_tpu.models.hicedrn import HicedrnDiff
    from hicdiff_tpu.parallel.mesh import (
        make_mesh,
        pad_batch,
        process_slice,
        replicated,
        shard_batch_local,
    )
    from hicdiff_tpu.train.trainer import Trainer

    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
    assert len(jax.local_devices()) == devices_per_proc
    n_global = nprocs * devices_per_proc
    assert len(jax.devices()) == n_global

    # the SAME mesh constructor as single-process: jax.devices() is global
    mesh = make_mesh()

    model = HicedrnDiff(
        self_condition=True, number_resnet=BLOCKS, features=FEATURES
    )
    engine = GaussianDiffusion.create(
        model, image_size=64, timesteps=TIMESTEPS, loss_type="l2",
        beta_schedule="cosine", mode="cond",
    )
    trainer = Trainer(engine, lr=2e-5, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(rng)  # replicate() across processes

    # ---- per-host input pipeline: every process loads the SHARED Splits
    # cache but materializes only its process_index slice (DESIGN.md: "each
    # host reads only its process_index slice of the Splits cache")
    with open(manifest_path) as f:
        man = json.load(f)
    noisy = np.transpose(np.load(man["noisy"]), (0, 2, 3, 1))  # NCHW cache -> NHWC
    full = np.transpose(np.load(man["full"]), (0, 2, 3, 1))
    b = int(man["batch"])
    # global pad first (all processes agree), then slice locally — this also
    # exercises the ragged-batch weight mask across the process boundary
    (noisy_g, full_g), weights_g = pad_batch((noisy[:b], full[:b]), n_global)
    lo, hi = process_slice(noisy_g.shape[0])
    batch_parts = shard_batch_local(
        mesh, noisy_g[lo:hi], full_g[lo:hi], weights_g[lo:hi]
    )
    data, target, weights = batch_parts

    ema = jnp.zeros(())  # ema_decay == 0 placeholder (Trainer.train_step)
    losses = []
    for step in range(2):  # two steps: optimizer state flows across psums
        key = jax.random.fold_in(rng, step)
        params, opt_state, ema, loss = trainer._train_step(
            params, opt_state, ema, key, (data, target), weights
        )
        losses.append(float(loss))  # replicated scalar: addressable anywhere

    # ---- truncated conditional sampling through the chunked dispatch path,
    # batch sharded over the global mesh (two reverse steps, two segments)
    sample_engine = dataclasses.replace(engine, t_start=1)
    sampler = sample_engine.chunked_sampler(chunk_steps=1)
    out = sampler(params, rng, target)
    # fully replicate so every process can fetch the complete output
    out_host = np.asarray(
        jax.jit(lambda x: x, out_shardings=replicated(mesh))(out)
    )
    assert out_host.shape == target.shape
    assert np.isfinite(out_host).all()

    if rank == 0:
        np.savez(
            out_path,
            losses=np.asarray(losses, np.float64),
            sample=out_host.astype(np.float32),
            n_processes=nprocs,
            n_devices=n_global,
        )
    print(
        f"multihost worker rank={rank}/{nprocs}: {len(jax.devices())} global "
        f"devices, losses={losses}, sample_sum={float(out_host.sum()):.6f}",
        flush=True,
    )


# ------------------------------------------------------------------ launcher
def launch(nprocs: int = 2, devices_per_proc: int = 4, workdir: str = None,
           keep_workdir: bool = False) -> dict:
    """Run the 1 x (nprocs*devices_per_proc) single-process reference and the
    nprocs x devices_per_proc multi-process configuration on the same Splits
    slice workload; assert loss and sampler-output equality; return the
    comparison record. Subprocess-only orchestration — never initializes a
    jax backend in the calling process (same isolation contract as
    __graft_entry__.dryrun_multichip)."""
    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="hicdiff_multihost_")
    os.makedirs(workdir, exist_ok=True)
    n_global = nprocs * devices_per_proc

    # prep in a child too: keeps this process jax-free even though prep is
    # itself host-side only
    r = subprocess.run(
        [sys.executable, "-m", "hicdiff_tpu.parallel.multihost",
         "--prep", workdir],
        cwd=REPO, env=_child_env(1), capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"multihost prep failed:\n{r.stdout}\n{r.stderr}")
    manifest = os.path.join(workdir, "manifest.json")

    def run_config(tag: str, n_p: int, d_per: int):
        port = _free_port()
        out = os.path.join(workdir, f"out_{tag}.npz")
        procs = []
        for rank in range(n_p):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "hicdiff_tpu.parallel.multihost",
                 "--worker", str(rank), "--nprocs", str(n_p),
                 "--devices-per-proc", str(d_per), "--port", str(port),
                 "--manifest", manifest, "--out", out],
                cwd=REPO, env=_child_env(d_per),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        logs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=1800)
            logs.append(stdout)
            if p.returncode != 0:
                for other in procs:
                    if other.poll() is None:
                        other.kill()
                raise RuntimeError(
                    f"multihost {tag} worker rc={p.returncode}:\n"
                    + "\n".join(logs)
                )
        sys.stdout.write("".join(logs))
        return np.load(out)

    ref = run_config("ref_1proc", 1, n_global)
    mh = run_config(f"mh_{nprocs}proc", nprocs, devices_per_proc)

    loss_diff = float(np.max(np.abs(ref["losses"] - mh["losses"])))
    out_diff = float(np.max(np.abs(ref["sample"] - mh["sample"])))
    record = {
        "config": f"{nprocs}x{devices_per_proc} vs 1x{n_global}",
        "ref_losses": [round(x, 8) for x in ref["losses"].tolist()],
        "mh_losses": [round(x, 8) for x in mh["losses"].tolist()],
        "max_loss_diff": loss_diff,
        "max_sample_diff": out_diff,
        "ok": bool(loss_diff < 1e-5 and out_diff < 1e-4),
    }
    print(json.dumps(record))
    if not record["ok"]:
        raise AssertionError(
            f"multi-process run diverged from single-process: {record}"
        )
    if own_tmp and not keep_workdir:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    return record


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--prep", metavar="WORKDIR", default=None)
    ap.add_argument("--worker", type=int, default=None, metavar="RANK")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default=None,
                    help="keep intermediate files here instead of a tmpdir")
    args = ap.parse_args(argv)
    if args.prep:
        print(prep(args.prep))
    elif args.worker is not None:
        worker(args.worker, args.nprocs, args.devices_per_proc, args.port,
               args.manifest, args.out)
    else:
        launch(args.nprocs, args.devices_per_proc, workdir=args.workdir,
               keep_workdir=args.workdir is not None)


if __name__ == "__main__":
    main()
