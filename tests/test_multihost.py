"""Multi-process (multi-host) execution tests — round-5 closure of the one
SURVEY §2.9 parallelism axis that previously existed only as DESIGN.md prose.

The heavy end-to-end check (2 OS processes x 4 virtual CPU devices, gloo
collectives, vs a 1x8 single-process reference) spawns three subprocesses
that each compile the tiny hicedrn train step — minutes on the 1-core CI
host — so it is opt-in via HICDIFF_TEST_MULTIHOST=1. The committed evidence
for the default suite is artifacts/multihost_dryrun.txt (regenerate with
`python -m hicdiff_tpu.parallel.multihost`). The cheap process-slice
arithmetic is always tested.
"""
import os

import numpy as np
import pytest

from hicdiff_tpu.parallel.mesh import process_slice


def test_process_slice_single_process_covers_everything():
    # under the test suite's single-process virtual mesh the slice is total
    lo, hi = process_slice(16)
    assert (lo, hi) == (0, 16)


def test_shard_batch_local_matches_shard_batch():
    """Single-process equivalence: the multi-host input path must place the
    same global values as the single-process convenience path."""
    import jax

    from hicdiff_tpu.parallel.mesh import make_mesh, shard_batch, shard_batch_local

    mesh = make_mesh()
    n = len(jax.devices())
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    (a,) = shard_batch(mesh, x)
    lo, hi = process_slice(n)
    (b,) = shard_batch_local(mesh, x[lo:hi])
    assert a.shape == b.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert b.sharding.spec == a.sharding.spec


@pytest.mark.skipif(
    not os.environ.get("HICDIFF_TEST_MULTIHOST"),
    reason="spawns 3 jax subprocesses (~2-4 min on 1 CPU core); "
    "set HICDIFF_TEST_MULTIHOST=1 — committed evidence: "
    "artifacts/multihost_dryrun.txt",
)
def test_two_process_run_matches_single_process():
    """The full 2x4-vs-1x8 equality harness: same Splits-slice workload, two
    train steps + a truncated sampling chain, losses and outputs must agree
    to float32 round-off across the process boundary."""
    from hicdiff_tpu.parallel.multihost import launch

    record = launch(nprocs=2, devices_per_proc=4)
    assert record["ok"]
    assert record["max_loss_diff"] < 1e-5
    assert record["max_sample_diff"] < 1e-4
