"""Device-mesh helpers for data-parallel training and sharded inference.

The reference is single-process (SURVEY.md section 2 "Parallelism
strategies"); here multi-chip scaling is first-class: a 1-D ``data`` mesh,
batches sharded over it, parameters replicated, and gradient allreduce left
to GSPMD (`jax.jit` + `NamedSharding`), which lowers to psum over ICI
(BASELINE.json:5). The model (~30M params) fits per-chip, so tensor/pipeline
parallelism is deliberately not built (SURVEY.md: "N/A; don't build").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def create_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the leading axis sharded over the
    mesh. Leading dims must be divisible by the mesh size."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host meshes span non-addressable devices, where plain device_put
    is invalid; every process holds the identical host value (same init
    seed / same restored checkpoint), so the global replicated array is
    assembled from process-local copies."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for jit in/out specs."""
    return replicated(mesh), batch_sharding(mesh)
