"""Measure the fused-epoch regimes at >16 steps/epoch (VERDICT r4 #1a).

The rolled lax.scan measured 0.83x vs the step loop at 5 steps/epoch (XLA
double-buffers the whole params+opt carry each iteration, STATUS round 4),
so `epoch_fuse: "auto"` now falls back to the step loop past
`epoch_fuse_max_steps` (16). This probe measures all regimes at a long-epoch
scale so the auto policy is evidence-based, not guessed:

  loop      — step loop, device cache on (the current auto fallback)
  rolled    — fused, unroll=1 (the regime that lost 17% at 5 steps)
  chunk8    — fused, unroll=8  (carry copy amortized over 8 steps)
  chunk16   — fused, unroll=16 (the cap default)
  unroll    — fused, fully unrolled (compile-size bound at this scale)

Scale: 144 train slices (96 subjects x 2 minus the fixed val/test subjects),
128x128, T=20; --batch 4 -> 36 steps/epoch, --batch 3 -> 48.
Val is decoupled (valid_period 50) so the numbers isolate the TRAIN loop.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fuse_scale.py \
        --out exp_results/fuse_scale.json
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

from bench_walltime import epoch_walls  # noqa: E402
from qualify_stack import build_config  # noqa: E402

MODES = {
    "loop": {"epoch_fuse": "false"},
    "rolled": {"epoch_fuse": "true", "epoch_fuse_max_steps": 1},
    "chunk8": {"epoch_fuse": "true", "epoch_fuse_max_steps": 8},
    "chunk16": {"epoch_fuse": "true", "epoch_fuse_max_steps": 16},
    "unroll": {"epoch_fuse": "true", "epoch_fuse_max_steps": 10_000},
}


def run_mode(cfg_base: dict, mode: str, epochs: int, out_dir: Path,
             batch: int) -> list[float]:
    from cardiax.main import run
    cfg = copy.deepcopy(cfg_base)
    cfg["training"].update(MODES[mode])
    cfg["training"]["device_data_cache"] = "true"
    cfg["training"]["batch_size"] = batch
    cfg["training"]["epochs"] = epochs
    cfg["training"]["log_epoch_walltime"] = True
    cfg["training"]["test"] = False
    cfg["others"]["valid_period"] = 50       # isolate the train loop
    run_dir = out_dir / f"mode_{mode}"
    cfg["saving"]["saving_dir"] = str(run_dir)
    jsonl = run_dir / "metrics.jsonl"
    if jsonl.exists():
        jsonl.unlink()
    run(cfg)
    return epoch_walls(jsonl)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-epochs", type=int, default=3)
    ap.add_argument("--meas-epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n-subjects", type=int, default=96)
    ap.add_argument("--modes", nargs="+", default=list(MODES))
    ap.add_argument("--out", default=str(REPO / "exp_results" / "fuse_scale.json"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args(argv)

    out_path = Path(args.out)
    out_dir = out_path.parent / "fuse_scale_runs"
    out_dir.mkdir(parents=True, exist_ok=True)

    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=args.n_subjects, slices_per_subject=2, h=args.h,
            w=args.h, n_frames=args.frames, seed=99))

    cfg_base = build_config(str(data_path), out_dir, "on", seed=2434, epochs=1)
    n_train = (args.n_subjects - 24) * 2      # fixed val/test subjects excluded
    n_steps = -(-n_train // args.batch)
    epochs = args.warm_epochs + args.meas_epochs

    results: dict = {"batch": args.batch, "n_train": n_train,
                     "steps_per_epoch": n_steps,
                     "warm_epochs": args.warm_epochs,
                     "meas_epochs": args.meas_epochs, "modes": {}}
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("probe_fuse_scale", timeout=600):
        for mode in args.modes:
            t0 = time.perf_counter()
            walls = run_mode(cfg_base, mode, epochs, out_dir, args.batch)
            total = time.perf_counter() - t0
            meas = walls[args.warm_epochs:]
            med = statistics.median(meas)
            results["modes"][mode] = {
                "run_wall_s": round(total, 2),
                "sec_per_epoch_median": round(med, 4),
                "sec_per_epoch_p10": round(
                    sorted(meas)[max(0, len(meas) // 10)], 4),
                "warm_epoch_walls_s": [round(w, 3)
                                       for w in walls[:args.warm_epochs]],
                "train_slices_per_sec_wall": round(n_train / med, 2),
            }
            print(f"{mode}: median {med:.3f} s/epoch ({n_steps} steps) "
                  f"=> {n_train / med:.1f} train slices/sec (wall)",
                  flush=True)

    if "loop" in results["modes"]:
        ref = results["modes"]["loop"]["sec_per_epoch_median"]
        for mode, r in results["modes"].items():
            r["vs_loop"] = round(ref / r["sec_per_epoch_median"], 3)
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
