"""A/B the strain-head temporal-mix lowering on the real TPU: tmix='shift'
(round-3 concat shift-adds) vs tmix='bandmm' (banded T-matmul; see
cardiax/models/strain_net.py) on the FULL flagship joint train step.

Motivation: the round-4 b40 profile shows XLA de-fusing the shift concats +
block reshapes into standalone data-formatting copies at large batch (4.2x
category growth for 2x batch — STATUS round-4 b40 analysis). bandmm removes
the concats/per-tap slices entirely; this tool measures whether that converts
to step time at b20 (production) and b40 (the regression point).

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tmix.py \
        [--batches 20 40] [--steps 20]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench_mode(tmix: str, batch: int, steps: int) -> float:
    import jax
    import bench
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    cfg = ge._flagship_config(h=bench.H, w=bench.W, t_myo=bench.T_FRAMES,
                              t_strain=bench.T_STRAIN,
                              n_sectors=bench.N_SECTORS, batch=batch)
    cfg["networks"]["joint_register_strainmat"]["n_integration_steps"] = 5
    cfg["networks"]["joint_register_strainmat"]["strain_tmix"] = tmix
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
    float(values["total_loss"])
    return (time.perf_counter() - t0) / steps


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[20, 40])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", nargs="+", default=["shift", "bandmm"],
                    help="tmix lowerings to A/B (shift / bandmm / shiftflat)")
    args = ap.parse_args(argv)

    rows = []
    for batch in args.batches:
        for tmix in args.modes:
            dt = bench_mode(tmix, batch, args.steps)
            rows.append((batch, tmix, dt))
            print(f"batch {batch:3d} tmix={tmix:7s}: {dt * 1e3:7.2f} ms/step "
                  f"({batch / dt:7.1f} slices/sec/chip)", flush=True)
    print("\nsummary:")
    for batch in args.batches:
        by = {t: dt for b, t, dt in rows if b == batch}
        base = args.modes[0]
        for mode in args.modes[1:]:
            if base in by and mode in by:
                print(f"  b{batch}: {mode}/{base} step-time ratio "
                      f"{by[mode] / by[base]:.3f}")


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_tmix"):
        main()
