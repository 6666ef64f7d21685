"""A/B the momentum-UNet channel_pack modes on the FULL joint train step
(VERDICT r2 #2 burn-down). Modes:

  off      — unpacked convs (shipping default; XLA fuses conv+norm+gelu)
  adaptive — per-level g = 128 // C (fills lanes, but the inter-level
             pack/repack relayouts break cross-layer fusion — measured
             regression, STATUS.md round 3)
  fixed:G  — ONE g for every level: pack at the UNet input, unpack at the
             output, zero relayouts in between (unet.MomentumUNet)

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_unet_pack.py \
        [--modes off 2 4 adaptive] [--batch 10 20]
Prints one JSON line per (mode, batch).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def measure(mode, batch: int, steps: int = 30) -> dict:
    import jax
    import bench
    from cardiax.models import build_model
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    cfg = ge._flagship_config(h=bench.H, w=bench.W, t_myo=bench.T_FRAMES,
                              t_strain=bench.T_STRAIN,
                              n_sectors=bench.N_SECTORS, batch=batch)
    net = cfg["networks"]["joint_register_strainmat"]
    net["n_integration_steps"] = 5
    net["channel_pack"] = (False if mode == "off"
                           else True if mode == "adaptive" else int(mode))
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
    for _ in range(5):
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    float(values["total_loss"])            # real sync (axon: see CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    loss = float(values["total_loss"])
    dt = (time.perf_counter() - t0) / steps
    assert loss == loss, "NaN loss"
    return {"mode": str(mode), "batch": batch,
            "ms_per_step": round(dt * 1e3, 2),
            "slices_per_sec_per_chip":
                round(batch / dt / jax.device_count(), 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["off", "2", "4"])
    ap.add_argument("--batch", type=int, nargs="+", default=[10])
    args = ap.parse_args(argv)
    for b in args.batch:
        for m in args.modes:
            print(json.dumps(measure(m, b)), flush=True)


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("bench_unet_pack"):
        main()
