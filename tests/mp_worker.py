"""One process of a 2-process CPU SPMD run (spawned by test_distributed_mp).

Exercises ``initialize_distributed``'s real ``jax.distributed.initialize``
branch (VERDICT r3 #4: that branch had never executed — a typo'd kwarg or bad
env plumbing would only surface on a real pod), then runs ONE full train step
of the flagship model over the GLOBAL 2-process mesh with the batch assembled
from per-host local shards via ``shard_global_batch``. Prints one JSON line
with the loss so the parent test can assert cross-process and
vs-single-process equality.

Usage: mp_worker.py <coordinator_port> <process_id> <num_processes> <local_devices>
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main():
    port, pid, nprocs, ndev = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}").strip()
    sys.path.insert(0, str(REPO))

    import jax
    # env JAX_PLATFORMS is ignored once the axon plugin registers (CLAUDE.md);
    # the config update is honored
    jax.config.update("jax_platforms", "cpu")
    # cross-process collectives on the CPU backend need gloo
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from cardiax.parallel.distributed import (initialize_distributed,
                                              shard_global_batch)

    ok = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=int(nprocs), process_id=int(pid))
    assert ok, "initialize_distributed returned False for a multi-process run"
    assert jax.process_count() == int(nprocs), jax.process_count()
    assert jax.local_device_count() == int(ndev), jax.local_device_count()

    import __graft_entry__ as ge
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh
    from cardiax.train import build_trainer

    batch = 8
    cfg = ge._flagship_config(batch=batch)
    host_batch = ge._synthetic_batch(batch=batch)

    mesh = get_mesh()  # all global devices on one 'data' axis
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    # setup sees the full (replicated) host batch — identical on every
    # process (same synthetic seed), so init + replication are consistent
    trainer.setup(networks, host_batch, steps_per_epoch=1,
                  seed=cfg["training"]["seed"])

    # each host contributes only ITS rows; shard_global_batch stitches the
    # local shards into global arrays over the mesh's data axis
    pc, pi = jax.process_count(), jax.process_index()
    per = batch // pc
    local = {k: v[pi * per:(pi + 1) * per]
             for k, v in host_batch.items()
             if isinstance(v, np.ndarray) and v.ndim >= 1
             and v.shape[0] == batch}
    arrays = shard_global_batch(local, mesh)
    arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}

    new_params, _, values = trainer._train_step(
        trainer.params, trainer.opt_states, arrays)
    loss = float(values["total_loss"])
    # one post-update param leaf hash-ish scalar so the parent can check the
    # updates agree across processes too (replicated -> addressable anywhere)
    leaf0 = jax.tree_util.tree_leaves(new_params)[0]
    print(json.dumps({
        "process": pi,
        "process_count": pc,
        "devices": jax.device_count(),
        "loss": loss,
        "param_leaf0_sum": float(jax.numpy.sum(leaf0)),
    }), flush=True)


if __name__ == "__main__":
    main()
