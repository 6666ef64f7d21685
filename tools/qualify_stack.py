"""Compound qualification of the speed-approximation stack (VERDICT r2 #1).

Round 2 qualified each speed default in isolation (single-seed piecewise A/B
runs, STATUS.md); this driver measures the WHOLE stack at once:

  arm "on"  — every speed default as shipped: shoot_downsample=2,
              reg_half_res=true, strain_downsample=2, banded warps (in-scan
              radius 2, final radius 12), fused+packed Pallas scan;
  arm "off" — the exact path: full-res shooting + UNet + strain head,
              XLA-gather warp, composite (non-Pallas) scan
              (networks.*.exact_warp=true + ds=1 + full res).

Each arm runs the flagship joint scheme on the SAME synthetic dataset at
reference shapes (128x128, T=20) for >=150 epochs with >=2 seeds, so the
compound ON-vs-OFF delta can be read against the seed-to-seed noise floor.
The held-out test split is >=32 slices (VERDICT r2 #8: LMA metrics with
meaningful support).

Usage (real TPU, ~30-60 min):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/qualify_stack.py \
        --epochs 150 --seeds 2434 7 --out exp_results/qualify
Writes per-run JSON + a summary table (summary.json / summary.md).
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

# 48 subjects x 2 slices = 96 slices: train 48 / val 16 / test 32
N_SUBJECTS = 48
TEST_SUBJ = [f"CT{i}" for i in range(32, 48)]     # 16 subjects -> 32 slices
VAL_SUBJ = [f"CT{i}" for i in range(24, 32)]      # 8 subjects  -> 16 slices

OFF_OVERRIDES = {"shoot_downsample": 1, "reg_half_res": False,
                 "strain_downsample": 1, "exact_warp": True,
                 "channel_pack": False}

METRIC_KEYS = [
    "final-test/sector_error", "final-test/LMA_auc", "final-test/LMA_f1_best",
    "final-test/LMA_accuracy", "final-test/loss_total_loss",
    "final-test/loss_registration_reconstruction",
    "final-val/sector_error", "final-val/LMA_auc",
    "final-val/loss_total_loss",
]


def build_config(data_path: str, out_dir: Path, arm: str, seed: int,
                 epochs: int) -> dict:
    cfg = json.loads((REPO / "configs" / "joint.json").read_text())
    cfg = copy.deepcopy(cfg)
    cfg["data"]["npy_filename"] = data_path
    cfg["data_split"]["splits"] = {
        "train": {"role": "train", "patterns": [".*"],
                  "exclude_patterns": [f".*{s}.*"
                                       for s in TEST_SUBJ + VAL_SUBJ]},
        "val": {"role": "val", "patterns": [f".*{s}.*" for s in VAL_SUBJ]},
        "test": {"role": "test", "patterns": [f".*{s}.*" for s in TEST_SUBJ]},
    }
    tr = cfg["training"]
    tr["seed"] = seed
    tr["epochs"] = epochs
    tr["epochs_without_improvement_tolerance"] = epochs   # no early stop: A/B-comparable trajectories
    # the synthetic set is small; at the reference's 0.005 the TOS term is ~1%
    # of the total loss and the head sits at the mean TOS (round-2 finding) —
    # raise it so LMA metrics are informative, identically in both arms
    cfg["losses"]["TOS_regression"]["weight"] = 0.5
    if arm == "off":
        cfg["networks"]["joint_register_strainmat"].update(OFF_OVERRIDES)
    cfg["saving"] = {"save_final_model": False, "save_checkpoint": False,
                     "save_prediction": False,
                     "saving_dir": str(out_dir / f"{arm}_seed{seed}")}
    cfg["others"] = {"use_wandb": False, "valid_period": 1}
    return cfg


def run_arm(cfg: dict) -> dict:
    from cardiax.main import run
    t0 = time.perf_counter()
    results = run(cfg)
    wall = time.perf_counter() - t0
    out = {"wall_seconds": round(wall, 1)}
    for t in ("val", "test"):
        for k, v in results.get(f"{t}_performance", {}).items():
            out[k] = float(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seeds", type=int, nargs="+", default=[2434, 7])
    ap.add_argument("--arms", nargs="+", default=["on", "off"])
    ap.add_argument("--out", default=str(REPO / "exp_results" / "qualify"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args(argv)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=N_SUBJECTS, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))
        print(f"wrote {data_path}")

    summary: dict = {"epochs": args.epochs, "h": args.h, "frames": args.frames,
                     "runs": {}}
    for seed in args.seeds:
        for arm in args.arms:
            tag = f"{arm}_seed{seed}"
            run_json = out_dir / f"{tag}.json"
            if run_json.exists():
                summary["runs"][tag] = json.loads(run_json.read_text())
                print(f"[{tag}] cached: {run_json}")
                continue
            print(f"=== {tag} (epochs={args.epochs}) ===")
            cfg = build_config(str(data_path), out_dir, arm, seed, args.epochs)
            res = run_arm(cfg)
            run_json.write_text(json.dumps(res, indent=1))
            summary["runs"][tag] = res
            print(f"[{tag}] done in {res['wall_seconds']}s")

    # ---- compound delta vs seed noise ----
    lines = ["# Compound approximation-stack qualification",
             f"epochs={args.epochs}, grid {args.h}^2, T={args.frames}, "
             f"train 48 / val 16 / test 32 slices", "",
             "| metric | " + " | ".join(
                 f"{a} s{s}" for s in args.seeds for a in args.arms)
             + " | ON-OFF delta (per seed) | seed noise (per arm) |",
             "|" + "---|" * (len(args.seeds) * len(args.arms) + 3)]
    table = {}
    for key in METRIC_KEYS:
        vals = {t: r.get(key) for t, r in summary["runs"].items()}
        if any(v is None for v in vals.values()):
            continue
        # ON-OFF deltas only when both arms actually ran (a single-arm
        # invocation via --arms must still produce a summary)
        deltas = [abs(vals[f"on_seed{s}"] - vals[f"off_seed{s}"])
                  for s in args.seeds] \
            if {"on", "off"} <= set(args.arms) else []
        noise = []
        if len(args.seeds) >= 2:
            for a in args.arms:
                vs = [vals[f"{a}_seed{s}"] for s in args.seeds]
                noise.append(max(vs) - min(vs))
        table[key] = {"values": vals, "on_off_delta": deltas,
                      "seed_noise": noise}
        lines.append(
            f"| {key} | "
            + " | ".join(f"{vals[f'{a}_seed{s}']:.4g}"
                         for s in args.seeds for a in args.arms)
            + " | " + ", ".join(f"{d:.3g}" for d in deltas)
            + " | " + ", ".join(f"{n:.3g}" for n in noise) + " |")
    summary["table"] = table
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    (out_dir / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("qualify_stack"):
        main()
