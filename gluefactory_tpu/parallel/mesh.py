"""Device mesh + sharding helpers (SURVEY.md §5.8 TPU-native equivalent).

The reference's DDP/NCCL stack (`train.py:620-638`) maps to: one global
`jax.sharding.Mesh`, batches sharded over the "data" axis, gradient
all-reduce emitted by XLA from the sharded-batch loss mean. Model axes
("model") are reserved for tensor-parallel matchers over the keypoint axis
(large-K matching; see `parallel/sharded_matching.py`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh. data=None -> all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data", replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with batch-axis sharding over the mesh.

    Single-process: a plain device_put with the "data" sharding. Multi-process
    (multi-host TPU pods, `jax.distributed.initialize`): each host passes its
    LOCAL per-host batch (what its loader yielded — loaders shard items by
    `process_index`, `datasets/base_dataset.py`) and the global array is
    assembled with `make_array_from_process_local_data`, so the global batch
    axis is host-major over the "data" mesh axis with zero cross-host copies.
    """
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            if multiproc:
                return jax.make_array_from_process_local_data(sh, np.asarray(x))
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, batch, is_leaf=lambda x: isinstance(x, (list, str)) or x is None)


def local_slice(batch, process_index=None, process_count=None):
    """Per-host slice of a global batch for multi-controller data loading."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return batch

    def slc(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            n = x.shape[0] // pc
            return x[pi * n : (pi + 1) * n]
        return x

    return jax.tree.map(slc, batch)
