"""Multi-host (multi-slice) setup helpers.

One real chip is available in this environment, so this module is exercised
on the forced-host CPU mesh; the code paths are the standard JAX multi-host
idioms: ``jax.distributed.initialize`` for the DCN control plane, a global
1-D data mesh over all chips, per-host data sharding (each host feeds only
its local batch shard - Grain's ShardOptions supply the indices), and
``jax.make_array_from_process_local_data`` to assemble global arrays.
Gradient allreduce stays inside the jitted step (GSPMD over ICI/DCN).
"""

from __future__ import annotations

import jax
import numpy as np

from multi_speaker_tts_tpu.parallel import mesh as mesh_lib


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host control plane. No-op in single-process runs
    (TPU pod environments usually auto-detect all three arguments)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


_barrier_seq = 0


def coordination_barrier(name: str = "sync", timeout_ms: int = 600_000) -> None:
    """Barrier through the coordination service ONLY (no device collective).

    The FIRST device collective of a run triggers the communicator
    handshake (Gloo context init on CPU), which has a hard ~30 s key-value
    deadline; per-host skew from compilation, checkpoint probing, or loader
    startup easily exceeds that on a loaded machine and wedges every
    process. Fencing with this barrier (10 min timeout, no communicator)
    right before the first collective bounds the handshake skew to
    milliseconds. No-op single-process."""
    global _barrier_seq
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    _barrier_seq += 1
    client.wait_at_barrier(f"msts_{name}_{_barrier_seq}", timeout_in_ms=timeout_ms)


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    Used once before the first training collective: per-host setup skew
    (Grain worker spawn, checkpoint probing) can exceed the CPU/Gloo
    rendezvous timeout if one host launches its first psum tens of seconds
    before another."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_shard_info() -> tuple[int, int]:
    """(shard_index, shard_count) for data loading on this host."""
    return jax.process_index(), jax.process_count()


def global_batch_from_local(mesh, local_batch: dict) -> dict:
    """Assemble a global (mesh-sharded) batch from this host's local shard.

    Each host holds ``global_batch_size / process_count`` rows; the returned
    arrays are jax.Arrays sharded over the mesh's data axis, usable directly
    as jitted-step inputs.
    """
    sharding = mesh_lib.batch_sharding(mesh)
    return {
        key: jax.make_array_from_process_local_data(sharding, np.asarray(value))
        for key, value in local_batch.items()
    }
