"""Multi-host SPMD setup (jax.distributed) + per-host data sharding helpers.

The reference has no distribution story at all (SURVEY.md 2.13); here scaling
past one host is:

    initialize_distributed()            # once per process, before jax use
    mesh = get_mesh()                   # global mesh over all hosts' devices
    batch = host_local_batch(...)       # each host loads its shard of data
    arrays = shard_global_batch(batch, mesh)

Collectives ride ICI within a slice and DCN across slices — all inserted by
GSPMD; there is no NCCL/MPI analog to configure.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from cardiax.parallel.mesh import batch_sharding


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX when launched across hosts.

    No-ops (returns False) in single-process runs: on a TPU pod slice the
    args come from the environment (TPU_* / JAX coordination vars), so bare
    ``jax.distributed.initialize()`` is usually right; explicit args override.
    """
    n = num_processes if num_processes is not None else int(
        os.environ.get("CARDIAX_NUM_PROCESSES", "1"))
    if n <= 1 and coordinator_address is None:
        return False
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return True


def host_shard_bounds(n_total: int) -> tuple[int, int]:
    """[start, end) of this host's slice of a globally-indexed dataset."""
    k = jax.process_count()
    i = jax.process_index()
    per = (n_total + k - 1) // k
    return i * per, min(n_total, (i + 1) * per)


def shard_global_batch(host_batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Assemble a GLOBAL sharded batch from per-host local shards.

    Each host passes its local batch (global_batch / process_count rows);
    `make_array_from_process_local_data` stitches them into one global jax
    Array sharded over the mesh's data axis.
    """
    n_shard = mesh.shape["data"]
    out: Dict[str, Any] = {}
    for k, v in host_batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            arr = np.asarray(v)
            local_per_host = n_shard // jax.process_count()
            if arr.ndim == 0 or arr.shape[0] * jax.process_count() % n_shard:
                raise ValueError(
                    f"shard_global_batch: field {k!r} has local leading dim "
                    f"{arr.shape[:1]} which cannot tile the mesh 'data' axis "
                    f"of size {n_shard} over {jax.process_count()} process(es)"
                    f" — pad the per-host batch to a multiple of "
                    f"{max(1, local_per_host)} (the Batcher does this)")
            sharding = batch_sharding(mesh, arr.ndim)
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        else:
            out[k] = v
    return out
