"""Accuracy qualification for flipping the strain-head temporal-mix default
to tmix='bandmm' (see cardiax/models/strain_net.py).

bandmm is the SAME math on the SAME params as 'shift' (parity pinned fwd+grad
in tests/test_schemes.py::test_temporal_mix_lowerings_match_shift); only the
bf16 accumulation order differs. This driver runs same-seed full training
arms anyway — the same evidence bar every earlier lowering change met (the
round-3 einsum reorder, the fused EPDiff kernel) — so the default flip is
backed by end-metric data, not just op-level parity.

Usage (real TPU, ~2 min at device-cache speeds):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/qualify_tmix.py \
        --epochs 150 --seeds 2434 7 --out exp_results/qualify_tmix
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.qualify_stack import METRIC_KEYS, N_SUBJECTS, build_config  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seeds", type=int, nargs="+", default=[2434, 7])
    ap.add_argument("--out", default=str(REPO / "exp_results" / "qualify_tmix"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--modes", nargs=2, default=["shift", "bandmm"],
                    help="the (baseline, candidate) tmix pair to A/B "
                         "(round 4: shift bandmm; round 5: bandmm shiftflat)")
    args = ap.parse_args(argv)
    base_mode, cand_mode = args.modes

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=N_SUBJECTS, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))

    from cardiax.main import run

    summary = {"epochs": args.epochs, "runs": {}}
    for seed in args.seeds:
        for tmix in (base_mode, cand_mode):
            tag = f"{tmix}_seed{seed}"
            run_json = out_dir / f"{tag}.json"
            if run_json.exists():
                summary["runs"][tag] = json.loads(run_json.read_text())
                print(f"[{tag}] cached")
                continue
            cfg = build_config(str(data_path), out_dir, "on", seed,
                               args.epochs)
            cfg["networks"]["joint_register_strainmat"]["strain_tmix"] = tmix
            cfg["saving"]["saving_dir"] = str(out_dir / tag)
            print(f"=== {tag} ===", flush=True)
            t0 = time.perf_counter()
            results = run(cfg)
            res = {"wall_seconds": round(time.perf_counter() - t0, 1)}
            for t in ("val", "test"):
                for k, v in results.get(f"{t}_performance", {}).items():
                    res[k] = float(v)
            run_json.write_text(json.dumps(res, indent=1))
            summary["runs"][tag] = res
            print(f"[{tag}] done in {res['wall_seconds']}s", flush=True)

    modes = (base_mode, cand_mode)
    lines = [f"# tmix default-flip qualification ({base_mode} vs {cand_mode})",
             f"epochs={args.epochs}, grid {args.h}^2, T={args.frames}, "
             "train 48 / val 16 / test 32 slices", "",
             "| metric | " + " | ".join(
                 f"{m} s{s}" for s in args.seeds for m in modes)
             + " | |delta| per seed |", "|" + "---|" * (2 * len(args.seeds) + 2)]
    for key in METRIC_KEYS:
        vals = {t: r.get(key) for t, r in summary["runs"].items()}
        if any(v is None for v in vals.values()):
            continue
        deltas = [abs(vals[f"{base_mode}_seed{s}"] - vals[f"{cand_mode}_seed{s}"])
                  for s in args.seeds]
        lines.append("| " + key + " | " + " | ".join(
            f"{vals[f'{m}_seed{s}']:.4g}"
            for s in args.seeds for m in modes)
            + " | " + ", ".join(f"{d:.3g}" for d in deltas) + " |")
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    (out_dir / "summary.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("qualify_tmix"):
        main()
