"""House qualification of the `epoch_fuse` shipping default (VERDICT r4 #1b).

Fused-epoch vs step-loop training is float-reorder-different (the scan body
compiles in a different fusion context), so flipping the default to 'auto'
requires the same bar every other numerics-affecting default met
(shoot_downsample, reg_half_res, strain_downsample, bandmm): a >=150-epoch,
>=2-seed end-metric A/B with deltas inside the seed-to-seed noise.

  arm "fused" — device cache + epoch_fuse 'true'
  arm "loop"  — device cache + epoch_fuse 'false' (the step loop)

Run at batch 10 (48 train slices -> 5 steps/epoch: the UNROLLED fused
regime) and batch 2 (24 steps/epoch: the ROLLED-scan regime the auto
policy ships for long epochs) so BOTH shipping regimes meet the bar.

Same dataset/splits/shapes as exp_results/qualify (qualify_stack.build_config:
96 synthetic slices 128^2 T=20, train 48 / val 16 / test 32).

Usage (real TPU, ~10 min):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/qualify_fuse.py \
        --epochs 150 --seeds 2434 7 --out exp_results/qualify_fuse
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from qualify_stack import METRIC_KEYS, N_SUBJECTS, build_config, run_arm  # noqa: E402

ARMS = {
    "fused": {"device_data_cache": "true", "epoch_fuse": "true"},
    "loop": {"device_data_cache": "true", "epoch_fuse": "false"},
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seeds", type=int, nargs="+", default=[2434, 7])
    ap.add_argument("--batches", type=int, nargs="+", default=[10, 2])
    ap.add_argument("--out", default=str(REPO / "exp_results" / "qualify_fuse"))
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

    summary: dict = {"epochs": args.epochs, "arms": list(ARMS),
                     "batches": args.batches, "runs": {}}
    for batch in args.batches:
        for seed in args.seeds:
            for arm, overrides in ARMS.items():
                tag = f"{arm}_b{batch}_seed{seed}"
                run_json = out_dir / f"{tag}.json"
                if run_json.exists():
                    summary["runs"][tag] = json.loads(run_json.read_text())
                    print(f"[{tag}] cached")
                    continue
                print(f"=== {tag} (epochs={args.epochs}) ===", flush=True)
                cfg = build_config(str(data_path), out_dir, f"{arm}_b{batch}",
                                   seed, args.epochs)
                cfg["training"].update(overrides)
                cfg["training"]["batch_size"] = batch
                res = run_arm(cfg)
                run_json.write_text(json.dumps(res, indent=1))
                summary["runs"][tag] = res
                print(f"[{tag}] done in {res['wall_seconds']}s", flush=True)

    lines = ["# epoch_fuse qualification: fused vs step loop",
             f"epochs={args.epochs}, grid {args.h}^2, T={args.frames}, "
             f"train 48 / val 16 / test 32 slices; batch 10 = unrolled "
             f"fused regime (5 steps/epoch), batch 2 = rolled regime "
             f"(24 steps/epoch)", ""]
    table = {}
    for batch in args.batches:
        lines += [f"## batch {batch}", "",
                  "| metric | " + " | ".join(
                      f"{a} s{s}" for s in args.seeds for a in ARMS)
                  + " | fused-loop delta (per seed) | seed noise (per arm) |",
                  "|" + "---|" * (len(args.seeds) * len(ARMS) + 3)]
        for key in METRIC_KEYS:
            vals = {f"{a}_seed{s}":
                    summary["runs"][f"{a}_b{batch}_seed{s}"].get(key)
                    for s in args.seeds for a in ARMS}
            if any(v is None for v in vals.values()):
                continue
            deltas = [abs(vals[f"fused_seed{s}"] - vals[f"loop_seed{s}"])
                      for s in args.seeds]
            noise = []
            if len(args.seeds) >= 2:
                for a in ARMS:
                    vs = [vals[f"{a}_seed{s}"] for s in args.seeds]
                    noise.append(max(vs) - min(vs))
            table[f"b{batch}/{key}"] = {"values": vals,
                                        "fused_loop_delta": deltas,
                                        "seed_noise": noise}
            lines.append(
                f"| {key} | "
                + " | ".join(f"{vals[f'{a}_seed{s}']:.4g}"
                             for s in args.seeds for a in ARMS)
                + " | " + ", ".join(f"{d:.3g}" for d in deltas)
                + " | " + ", ".join(f"{n:.3g}" for n in noise) + " |")
        lines.append("")
    summary["table"] = table
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    (out_dir / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("qualify_fuse"):
        main()
