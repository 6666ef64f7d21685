"""End-to-end training WALL-CLOCK throughput: device-cache on vs off (VERDICT r3 #2).

The device step is ~16 ms but round-3 real training ran ~4.3 s/epoch — the
wall time went to per-step host->device transfer over the tunneled PCIe plus
per-metric blocking syncs (STATUS.md round 3). The round-3 engine fixes
(DeviceBatcher dataset cache + deferred metric sync) were built and
bit-identity-tested but never measured on hardware. This tool measures them.

Methodology (v2): per-epoch wall times are measured INSIDE one process per
mode via `training.log_epoch_walltime` (engine stamps `time/epoch_wall_s`
per epoch, measured epoch-start -> after the epoch-end device_get syncs).
The first --warm-epochs epochs are discarded (compile + cache upload); the
median of the remaining --meas-epochs epochs is the figure. The previous
difference-of-two-runs design was invalidated on hardware: the XLA persistent
compile cache made the second (longer) run's fixed cost ~150 s smaller than
the first's, producing a negative marginal, and ~1 s run-to-run setup noise
swamped small marginals.

Derived headline: **end-to-end training slices/sec (wall)** =
train_slices / median_epoch_wall (val loop at valid_period 1 included: that
IS real training; reference hot loop joint_registration_strainmat_LMA.py:179-263).

Scale: the qualification shape — 96 synthetic slices (train 48 / val 16 /
test 32), 128x128, T=20, batch 10.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_walltime.py \
        --out exp_results/walltime.json
"""

from __future__ import annotations

import argparse
import copy
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO / "tools"))
from qualify_stack import N_SUBJECTS, build_config  # noqa: E402


def epoch_walls(metrics_jsonl: Path) -> list[float]:
    """epoch -> time/epoch_wall_s, in epoch order."""
    walls: dict[int, float] = {}
    for line in metrics_jsonl.read_text().splitlines():
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "time/epoch_wall_s" in row and "step" in row:
            walls[int(row["step"])] = float(row["time/epoch_wall_s"])
    return [walls[e] for e in sorted(walls)]


def run_mode(cfg_base: dict, mode: str, epochs: int, out_dir: Path) -> list[float]:
    from cardiax.main import run
    cfg = copy.deepcopy(cfg_base)
    cfg["training"]["epochs"] = epochs
    if mode == "fused":
        # device cache + the whole epoch as ONE jitted lax.scan dispatch
        cfg["training"]["device_data_cache"] = "true"
        cfg["training"]["epoch_fuse"] = "true"
    else:
        cfg["training"]["device_data_cache"] = mode
    cfg["training"]["log_epoch_walltime"] = True
    cfg["training"]["test"] = False          # time the TRAIN loop only
    run_dir = out_dir / f"mode_{mode}"
    cfg["saving"]["saving_dir"] = str(run_dir)
    jsonl = run_dir / "metrics.jsonl"
    if jsonl.exists():
        jsonl.unlink()                       # tracker appends; start clean
    run(cfg)
    return epoch_walls(jsonl)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-epochs", type=int, default=3)
    ap.add_argument("--meas-epochs", type=int, default=20)
    ap.add_argument("--out", default=str(REPO / "exp_results" / "walltime.json"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--modes", nargs="+", default=["false", "true"],
                    help="any of: false true fused")
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
    epochs = args.warm_epochs + args.meas_epochs

    from cardiax.utils.tpulock import tpu_lock

    results: dict = {"warm_epochs": args.warm_epochs,
                     "meas_epochs": args.meas_epochs,
                     "methodology": "in-process per-epoch walls, median over "
                                    "meas epochs after warmup", "modes": {}}
    with tpu_lock("bench_walltime", timeout=600):
        for mode in args.modes:
            t0 = time.perf_counter()
            walls = run_mode(cfg_base, mode, epochs, out_dir)
            total = time.perf_counter() - t0
            meas = walls[args.warm_epochs:]
            med = statistics.median(meas)
            results["modes"][mode] = {
                "run_wall_s": round(total, 2),
                "n_epochs_measured": len(meas),
                "sec_per_epoch_median": round(med, 4),
                "sec_per_epoch_p10": round(
                    sorted(meas)[max(0, len(meas) // 10)], 4),
                "sec_per_epoch_p90": round(
                    sorted(meas)[min(len(meas) - 1, 9 * len(meas) // 10)], 4),
                "warm_epoch_walls_s": [round(w, 3)
                                       for w in walls[:args.warm_epochs]],
                "train_slices_per_sec_wall": round(n_train / med, 2),
            }
            print(f"device_data_cache={mode}: median {med:.3f} s/epoch "
                  f"=> {n_train / med:.1f} train slices/sec (wall)",
                  flush=True)

    modes = results["modes"]
    if "false" in modes and "true" in modes:
        off = modes["false"]["sec_per_epoch_median"]
        on = modes["true"]["sec_per_epoch_median"]
        results["speedup_wall"] = round(off / on, 2)
        print(f"device-cache wall-clock speedup: {results['speedup_wall']}x")
    if "true" in modes and "fused" in modes:
        results["fuse_speedup_wall"] = round(
            modes["true"]["sec_per_epoch_median"]
            / modes["fused"]["sec_per_epoch_median"], 2)
        print(f"epoch-fuse wall-clock speedup over cache-only: "
              f"{results['fuse_speedup_wall']}x")
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
