"""Probe deeper item packing in the fused EPDiff scan on the real TPU.

The flagship ships 2x2 packing (64^2 grid -> 128x128 packed plane, 4 items).
Doubling the row packing once more (pr=4 -> 256x128 plane, 8 items) halves
the number of per-step kernel dispatches while staying at a FULL-STEP-proven
plane size (256x128 packed planes run in the 256^2-frame bench_large row).
This tool A/Bs the FULL flagship joint train step with the shipped pack_plan
vs a forced deeper-row variant.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_pack.py \
        [--batches 10 20] [--steps 20]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _deep_pack_plan(n: int, h: int, w: int):
    """pack_plan with the row doubling as a WHILE (pr can reach 4+)."""
    from cardiax.ops.epdiff_pallas import _MAX_FUSED_SCAN_PIXELS
    pr = pc = 1
    while w * pc < 128 and (h * pr) * (w * pc * 2) <= _MAX_FUSED_SCAN_PIXELS:
        pc *= 2
    while (h * pr * 2) * (w * pc) <= _MAX_FUSED_SCAN_PIXELS and h * pr < 256:
        pr *= 2
    n_pad = (-n) % (pr * pc)
    return pr, pc, n_pad


def bench_mode(deep: bool, batch: int, steps: int) -> float:
    import jax
    import bench
    from cardiax.ops import epdiff_pallas
    from cardiax.ops import shooting
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    saved = epdiff_pallas.pack_plan
    if deep:
        epdiff_pallas.pack_plan = _deep_pack_plan
        # shooting may have imported the symbol directly
        if getattr(shooting, "pack_plan", None) is saved:
            shooting.pack_plan = _deep_pack_plan
    try:
        cfg = ge._flagship_config(h=bench.H, w=bench.W, t_myo=bench.T_FRAMES,
                                  t_strain=bench.T_STRAIN,
                                  n_sectors=bench.N_SECTORS, batch=batch)
        cfg["networks"]["joint_register_strainmat"]["n_integration_steps"] = 5
        host_batch = ge._synthetic_batch(batch=batch, h=bench.H, w=bench.W,
                                         t_myo=bench.T_FRAMES,
                                         t_strain=bench.T_STRAIN,
                                         n_sectors=bench.N_SECTORS)
        mesh = get_mesh()
        networks = {name: build_model(mc)
                    for name, mc in cfg["networks"].items()}
        trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
        trainer.setup(networks, host_batch, steps_per_epoch=1,
                      seed=cfg["training"]["seed"])
        arrays = shard_batch(host_batch, mesh)
        arrays = {k: v for k, v in arrays.items()
                  if isinstance(v, jax.Array)}
        params, opt_states = trainer.params, trainer.opt_states
        for _ in range(3):
            params, opt_states, values = trainer._train_step(
                params, opt_states, arrays)
        float(values["total_loss"])   # sync (axon: block_until_ready no-op)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_states, values = trainer._train_step(
                params, opt_states, arrays)
        float(values["total_loss"])
        return (time.perf_counter() - t0) / steps
    finally:
        epdiff_pallas.pack_plan = saved
        if getattr(shooting, "pack_plan", None) is _deep_pack_plan:
            shooting.pack_plan = saved


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[10, 20])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    from cardiax.ops.epdiff_pallas import pack_plan
    print(f"shipped pack_plan(190, 64, 64) = {pack_plan(190, 64, 64)}; "
          f"deep = {_deep_pack_plan(190, 64, 64)}")
    for batch in args.batches:
        ds = {}
        for deep in (False, True):
            dt = bench_mode(deep, batch, args.steps)
            ds[deep] = dt
            tag = "deep(pr=4)" if deep else "shipped   "
            print(f"batch {batch:3d} {tag}: {dt * 1e3:7.2f} ms/step "
                  f"({batch / dt:7.1f} slices/sec/chip)", flush=True)
        print(f"  b{batch}: deep/shipped ratio {ds[True] / ds[False]:.3f}")


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_pack"):
        main()
