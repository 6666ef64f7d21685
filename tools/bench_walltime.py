"""End-to-end training WALL-CLOCK throughput: device-cache on vs off (VERDICT r3 #2).

The device step is ~16 ms but round-3 real training ran ~4.3 s/epoch — the
wall time went to per-step host->device transfer over the tunneled PCIe plus
per-metric blocking syncs (STATUS.md round 3). The round-3 engine fixes
(DeviceBatcher dataset cache + deferred metric sync) were built and
bit-identity-tested but never measured on hardware. This tool measures them:

    for cache in (off, on):
        wall(E_warm epochs) and wall(E_warm + E_meas epochs), same process
        -> marginal sec/epoch = (wall_long - wall_short) / E_meas
           (compile + setup costs cancel in the difference)

and derives the headline the >=5x north star actually describes:
**end-to-end training slices/sec (wall)** = train_slices * E_meas / diff.

Scale: the qualification shape — 96 synthetic slices (train 48 / val 16 /
test 32), 128x128, T=20, batch 10, valid_period 1 (val loop included: that IS
real training; reference hot loop joint_registration_strainmat_LMA.py:179-263).

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_walltime.py \
        --out exp_results/walltime.json
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO / "tools"))
from qualify_stack import N_SUBJECTS, build_config  # noqa: E402


def run_epochs(cfg_base: dict, epochs: int, mode: str, out_dir: Path) -> float:
    from cardiax.main import run
    cfg = copy.deepcopy(cfg_base)
    cfg["training"]["epochs"] = epochs
    cfg["training"]["device_data_cache"] = mode
    cfg["training"]["test"] = False          # time the TRAIN loop only
    cfg["saving"]["saving_dir"] = str(out_dir / f"{mode}_{epochs}")
    t0 = time.perf_counter()
    run(cfg)
    return time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-epochs", type=int, default=3)
    ap.add_argument("--meas-epochs", type=int, default=20)
    ap.add_argument("--out", default=str(REPO / "exp_results" / "walltime.json"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args(argv)

    out_path = Path(args.out)
    out_dir = out_path.parent / "walltime_runs"
    out_dir.mkdir(parents=True, exist_ok=True)

    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=N_SUBJECTS, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))

    cfg_base = build_config(str(data_path), out_dir, "on", seed=2434,
                            epochs=1)
    n_train = 48  # train split of the 96-slice set (qualify_stack split)

    from cardiax.utils.tpulock import tpu_lock

    results: dict = {"warm_epochs": args.warm_epochs,
                     "meas_epochs": args.meas_epochs, "modes": {}}
    with tpu_lock("bench_walltime", timeout=600):
        for mode in ("false", "true"):
            short = run_epochs(cfg_base, args.warm_epochs, mode, out_dir)
            long = run_epochs(cfg_base, args.warm_epochs + args.meas_epochs,
                              mode, out_dir)
            sec_per_epoch = (long - short) / args.meas_epochs
            results["modes"][mode] = {
                "wall_short_s": round(short, 2),
                "wall_long_s": round(long, 2),
                "sec_per_epoch": round(sec_per_epoch, 4),
                "train_slices_per_sec_wall":
                    round(n_train / sec_per_epoch, 2),
            }
            print(f"device_data_cache={mode}: {sec_per_epoch:.3f} s/epoch "
                  f"=> {n_train / sec_per_epoch:.1f} train slices/sec (wall)",
                  flush=True)

    off = results["modes"]["false"]["sec_per_epoch"]
    on = results["modes"]["true"]["sec_per_epoch"]
    results["speedup_wall"] = round(off / on, 2)
    print(f"device-cache wall-clock speedup: {results['speedup_wall']}x")
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
