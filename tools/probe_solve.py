"""A/B the fused in-kernel spectral solve on the real TPU (VERDICT r4 #4):
shooting._FUSED_SOLVE True (v = K m as MXU matmuls inside the EPDiff step
kernel, no per-step XLA<->Pallas HBM round trip, no v residual) vs False
(round-4 lowering: separate XLA einsum solve per step), on the FULL flagship
joint train step.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_solve.py \
        [--batches 10 20 40] [--steps 20]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench_mode(fused_solve: bool, batch: int, steps: int) -> float:
    import jax
    import bench
    import cardiax.ops.shooting as sh
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    sh._FUSED_SOLVE = fused_solve
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
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    float(values["total_loss"])  # sync (axon: block_until_ready is a no-op)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    loss = float(values["total_loss"])
    assert loss == loss, "NaN loss in probe step"
    return (time.perf_counter() - t0) / steps


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[10, 20, 40])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    rows = []
    for batch in args.batches:
        for mode in (False, True):
            dt = bench_mode(mode, batch, args.steps)
            rows.append((batch, mode, dt))
            name = "fused_solve" if mode else "xla_solve  "
            print(f"batch {batch:3d} {name}: {dt * 1e3:7.2f} ms/step "
                  f"({batch / dt:7.1f} slices/sec/chip)", flush=True)
    print("\nsummary:")
    for batch in args.batches:
        by = {m: dt for b, m, dt in rows if b == batch}
        if len(by) == 2:
            print(f"  b{batch}: fused/xla step-time ratio "
                  f"{by[True] / by[False]:.3f}")


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_solve"):
        main()
