"""End-to-end joint train step at clinical pre-resize resolutions
(VERDICT r2 #3): the reference resizes raw DENSE frames DOWN to 128
(/root/reference/modules/data/datareader/DENSE_IO.py:52-58); cardiax's pitch
is that TPU-native kernels make full-resolution training viable. This bench
compiles and times the FULL flagship train step at 256^2 and 512^2 frames
(T=8) and reports which kernel each stage engaged (warp_plan/scan_plan).

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_large.py \
        [--sizes 256 512] [--batch 2] [--frames 8]
Prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def measure(h: int, batch: int, t_frames: int, steps: int = 10,
            w: int | None = None) -> dict:
    import jax
    from cardiax.models import build_model
    from cardiax.ops.shooting import scan_plan
    from cardiax.ops.warp_pallas import warp_plan
    from cardiax.parallel.mesh import get_mesh, shard_batch
    from cardiax.train import build_trainer
    import __graft_entry__ as ge

    w = h if w is None else w
    t_strain = 2 * t_frames
    cfg = ge._flagship_config(h=h, w=w, t_myo=t_frames, t_strain=t_strain,
                              batch=batch)
    net = cfg["networks"]["joint_register_strainmat"]
    net["n_integration_steps"] = 5
    ds = int(net.get("shoot_downsample", 2))
    report = {
        "frame": f"{h}x{w}", "batch": batch, "t_frames": t_frames,
        "scan": scan_plan(h // ds, w // ds, backend="tpu"),
        "scan_grid": f"{h // ds}x{w // ds} (shoot_downsample={ds})",
        "final_warp": warp_plan(h, w, radius=12, backend="tpu"),
    }
    host_batch = ge._synthetic_batch(batch=batch, h=h, w=w, t_myo=t_frames,
                                     t_strain=t_strain)
    mesh = get_mesh()
    networks = {name: build_model(mc) for name, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg, mesh=mesh)
    t0 = time.perf_counter()
    trainer.setup(networks, host_batch, steps_per_epoch=1,
                  seed=cfg["training"]["seed"])
    arrays = shard_batch(host_batch, mesh)
    arrays = {k: v for k, v in arrays.items() if isinstance(v, jax.Array)}
    params, opt_states = trainer.params, trainer.opt_states
    for _ in range(3):
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    loss = float(values["total_loss"])   # sync (axon: block_until_ready no-op)
    report["compile_plus_warmup_s"] = round(time.perf_counter() - t0, 1)
    assert loss == loss, "NaN loss at large frame size"

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_states, values = trainer._train_step(params, opt_states,
                                                         arrays)
    loss = float(values["total_loss"])
    dt = (time.perf_counter() - t0) / steps
    report["ms_per_step"] = round(dt * 1e3, 2)
    report["slices_per_sec_per_chip"] = round(batch / dt / jax.device_count(), 2)
    report["total_loss"] = round(loss, 4)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", default=["256", "512"],
                    help="square size N or rectangular HxW")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args(argv)
    for size in args.sizes:
        h, _, w = str(size).partition("x")
        h, w = int(h), int(w) if w else int(h)
        print(json.dumps(measure(h, args.batch, args.frames, args.steps,
                                 w=w)), flush=True)


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("bench_large"):
        main()
