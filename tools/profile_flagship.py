"""Profile the flagship joint train step on the real TPU and print the per-op
device-time table (cardiax.io.profiling). Substantiates the step-time budget
in STATUS.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_flagship.py [out_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(out_dir: str = "/tmp/cardiax_profile", steps: int = 10,
         batch: int | None = None) -> None:
    import jax
    import bench
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    batch = batch or bench.BATCH   # --batch 40: the b40 drop investigation
    cfg = ge._flagship_config(h=bench.H, w=bench.W, t_myo=bench.T_FRAMES,
                              t_strain=bench.T_STRAIN,
                              n_sectors=bench.N_SECTORS, batch=batch)
    cfg["networks"]["joint_register_strainmat"]["n_integration_steps"] = 5
    host_batch = ge._synthetic_batch(batch=batch, h=bench.H, w=bench.W,
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

    params, opt_states = trainer.params, trainer.opt_states
    for _ in range(3):
        params, opt_states, values = trainer._train_step(params, opt_states, arrays)
    float(values["total_loss"])  # sync (axon: block_until_ready is a no-op)

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_states, values = trainer._train_step(params, opt_states, arrays)
    float(values["total_loss"])
    dt = (time.perf_counter() - t0) / steps
    jax.profiler.stop_trace()
    print(f"wall step time: {dt * 1e3:.1f} ms at batch {batch} "
          f"({batch / dt:.1f} slices/sec/chip)")

    from cardiax.io.profiling import print_trace_summary
    print_trace_summary(out_dir, top_k=30)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/cardiax_profile")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=None)
    a = ap.parse_args()
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("profile_flagship"):
        main(a.out_dir, steps=a.steps, batch=a.batch)
