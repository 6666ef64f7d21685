"""Device mesh + sharding rules — the framework's entire distribution story.

The reference is single-process single-GPU (SURVEY.md section 2.13: no
torch.distributed anywhere); here distribution is first-class and free:

  * one ``jax.sharding.Mesh`` over all devices, default a 1-D ``data`` axis;
  * batches are sharded along axis 0 with ``NamedSharding(P('data'))``;
  * params/opt-state are replicated; under ``jit`` XLA GSPMD inserts the
    gradient all-reduce (psum over ICI) automatically — no NCCL analog to
    write;
  * the pairwise registration workload also shards its B*(T-1) pair axis by
    flattening pairs into the batch axis before the device boundary (the
    TPU-idiomatic "sequence parallelism" for cine frames, SURVEY.md 5.7).

Multi-host: `jax.distributed.initialize()` before `get_mesh()` makes the same
code SPMD across hosts; collectives ride ICI intra-slice / DCN inter-slice.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return jax.local_device_count()


_DEFAULT_AXIS_NAMES = ("data", "seq", "model", "expert")


def get_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
             axis_names: Optional[Sequence[str]] = None,
             devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a mesh over devices. Default: all devices on one ``data`` axis.

    ``mesh_shape`` may name fewer devices than exist (prefix is used); pass
    e.g. ``(4, 2)`` for a 2-D ('data', 'seq') mesh — batches shard over the
    full axis product (`batch_sharding` defaults to every mesh axis), so the
    folded B*(T-1) pair axis spreads over both dimensions: data parallelism
    over slices x sequence parallelism over cine pairs. Custom names via
    ``axis_names``.
    """
    devs = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devs),)
    n = int(np.prod(mesh_shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {mesh_shape} needs {n} devices, "
                         f"have {len(devs)}")
    grid = np.array(devs[:n]).reshape(mesh_shape)
    names = tuple(axis_names) if axis_names is not None \
        else _DEFAULT_AXIS_NAMES[: grid.ndim]
    if len(names) != grid.ndim:
        raise ValueError(f"{len(names)} axis names for a {grid.ndim}-D mesh")
    return Mesh(grid, names)


def batch_sharding(mesh: Mesh, ndim: int, axis=None) -> NamedSharding:
    """Shard axis 0 over ``axis`` (default: ALL mesh axes), replicate rest."""
    if axis is None:
        axis = tuple(mesh.axis_names)
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis=None) -> Dict[str, Any]:
    """device_put the array leaves of a host batch, batch-axis sharded over
    ``axis`` (default: the full mesh axis product).

    Non-array fields (id strings, metadata lists) stay host-side. Arrays whose
    leading dim doesn't divide the mesh axis are replicated (they're small
    labels in practice; the Batcher pads real batches to a divisible size).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n_shard = int(np.prod([mesh.shape[a] for a in axes]))
    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            if v.ndim >= 1 and v.shape[0] % n_shard == 0:
                out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim, axis))
            else:
                out[k] = jax.device_put(v, replicate_sharding(mesh))
        else:
            out[k] = v
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
