"""Device-mesh utilities for data-parallel training and sampling.

The reference is single-GPU with no distributed support of any kind (SURVEY.md
§2.9); this module is the new first-class parallel layer: a 1-D `data` mesh over
all chips, batch sharding via NamedSharding, and padding helpers so ragged final
batches shard evenly. Gradients/metrics reduce over ICI via the collectives XLA
inserts under jit — no NCCL-style code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "pad_batch",
    "shard_batch",
    "shard_batch_local",
    "process_slice",
    "replicate",
]

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(
    arrays: Tuple[np.ndarray, ...], multiple: int
) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
    """Zero-pad each array's batch dim to a multiple of `multiple`; returns the
    padded arrays plus a (padded_b,) weight mask (1 real / 0 padding)."""
    b = arrays[0].shape[0]
    target = -(-b // multiple) * multiple
    pad = target - b
    if pad == 0:
        return arrays, np.ones(b, np.float32)
    out = []
    for a in arrays:
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, widths))
    weights = np.concatenate([np.ones(b, np.float32), np.zeros(pad, np.float32)])
    return tuple(out), weights


def shard_batch(mesh: Mesh, *arrays):
    """device_put each array with its batch dim sharded over the mesh."""
    sh = data_sharding(mesh)
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def process_slice(n_global: int) -> Tuple[int, int]:
    """[lo, hi) of the global batch this PROCESS owns — the multi-host input
    contract (DESIGN.md): patches are i.i.d., so each host reads only its
    `process_index` contiguous slice of the Splits cache. Single-process:
    the whole batch. n_global must divide evenly by process_count (callers
    pad to a multiple of the global device count first, which is always a
    multiple of the process count)."""
    nproc = jax.process_count()
    assert n_global % nproc == 0, (n_global, nproc)
    per = n_global // nproc
    lo = jax.process_index() * per
    return lo, lo + per


def shard_batch_local(mesh: Mesh, *local_arrays, axis: str = DATA_AXIS):
    """Multi-process twin of `shard_batch`: each process passes ONLY its
    `process_slice` of the global batch, and the global jax.Arrays are
    assembled without any process ever materializing the full batch
    (jax.make_array_from_process_local_data — on TPU pods the local shards
    are already on the right hosts, so no data moves). With one process this
    is exactly `shard_batch`. Executed cross-process by
    hicdiff_tpu/parallel/multihost.py."""
    sh = data_sharding(mesh, axis)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in local_arrays
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
