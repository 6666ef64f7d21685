"""Inference-throughput measurement of the flagship eval step on the real
TPU (same shapes as bench.py). Substantiates the serving numbers in
STATUS.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_inference.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(warmup: int = 5, steps: int = 50) -> None:
    import jax
    import bench
    import __graft_entry__ as ge
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer

    cfg = ge._flagship_config(h=bench.H, w=bench.W, t_myo=bench.T_FRAMES,
                              t_strain=bench.T_STRAIN,
                              n_sectors=bench.N_SECTORS, batch=bench.BATCH)
    host_batch = ge._synthetic_batch(batch=bench.BATCH, h=bench.H, w=bench.W,
                                     t_myo=bench.T_FRAMES,
                                     t_strain=bench.T_STRAIN,
                                     n_sectors=bench.N_SECTORS)
    mesh = get_mesh()
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    trainer.setup(networks, host_batch, steps_per_epoch=1,
                  seed=cfg["training"]["seed"])
    arrays = shard_batch(host_batch, mesh)
    arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}

    for _ in range(warmup):
        values, _ = trainer._eval_step(trainer.params, arrays)
    float(values["total_loss"])  # sync (axon: block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(steps):
        values, _ = trainer._eval_step(trainer.params, arrays)
    float(values["total_loss"])
    dt = (time.perf_counter() - t0) / steps
    print(f"eval step: {dt * 1e3:.2f} ms / batch {bench.BATCH} = "
          f"{bench.BATCH / dt:.1f} slices/sec/chip")


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("bench_inference"):
        main()
