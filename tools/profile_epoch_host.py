"""Host-side attribution of the fused-epoch wall time (VERDICT r4 #3).

The fused epoch measured 0.155 s at qualify scale vs the ~0.08 s ideal of
16 ms/step x 5 steps — and STATUS round 4 showed the residue is NOT the bulk
metric sync (device_get of 35 scalars = 0.2 ms). This tool runs fused
training with `training.host_profile` (per-epoch perf_counter stamps of
every host segment: epoch_plan build, dispatch call, bulk sync, val, tracker
IO, best/ckpt) and prints the median attribution table.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_epoch_host.py \
        --out exp_results/host_profile.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from qualify_stack import build_config  # noqa: E402

PHASES = ["plan", "dispatch", "sync", "val", "track", "beststop", "ckpt",
          "total"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--warm-epochs", type=int, default=3)
    ap.add_argument("--out", default=str(REPO / "exp_results" / "host_profile.json"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--no-combined-val", action="store_true",
                    help="measure with the separate val dispatch (A/B arm)")
    ap.add_argument("--pipeline", default="auto",
                    choices=["auto", "true", "false"],
                    help="training.epoch_pipeline arm (dispatch epoch k+1 "
                         "before syncing epoch k)")
    args = ap.parse_args(argv)

    out_path = Path(args.out)
    out_dir = out_path.parent / "host_profile_runs"
    out_dir.mkdir(parents=True, exist_ok=True)
    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=48, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))

    cfg = build_config(str(data_path), out_dir, "host", seed=2434,
                       epochs=args.epochs)
    tr = cfg["training"]
    tr.update({"device_data_cache": "true", "epoch_fuse": "true",
               "epoch_pipeline": args.pipeline,
               "host_profile": True, "log_epoch_walltime": True,
               "test": False})

    # drive the engine directly so trainer.host_profile_rows is reachable
    from cardiax.data import load_data
    from cardiax.data.datasets import build_datasets
    from cardiax.data.split import split_data
    from cardiax.models import build_model
    from cardiax.train import build_trainer

    data = load_data(cfg["data"], cfg)
    splits = split_data(data, cfg["data_split"])
    datasets = build_datasets(cfg["datasets"], splits, cfg)
    networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
    trainer = build_trainer(cfg["training"], None, cfg)
    if args.no_combined_val:
        # monkeypatch the combined builder away: separate val dispatch arm
        trainer._build_epoch_trainval_fn = lambda *a, **k: None
    trainer.train(models=networks, datasets=datasets,
                  trainer_config=cfg["training"], full_config=cfg)

    rows = trainer.host_profile_rows[args.warm_epochs:]
    assert rows, "no host-profile rows collected — fused path not engaged?"
    med = {p: statistics.median(r.get(p, 0.0) for r in rows) for p in PHASES}
    accounted = sum(v for k, v in med.items() if k != "total")
    # steady-state epoch CADENCE: diff of consecutive process-completion
    # stamps. Under epoch pipelining the per-row `total` spans two
    # overlapped epochs; the cadence is the honest wall-per-epoch figure
    # (identical to `total` in the synchronous loop).
    dones = [r["t_done"] for r in trainer.host_profile_rows if "t_done" in r]
    diffs = [b - a for a, b in zip(dones, dones[1:])][args.warm_epochs:]
    cadence = statistics.median(diffs) if diffs else None
    arm = ("separate_val" if args.no_combined_val else "combined")
    if trainer.last_pipeline_engaged:
        arm += "+pipeline"
    result = {"arm": arm,
              "pipeline_engaged": bool(trainer.last_pipeline_engaged),
              "n_epochs": len(rows),
              "median_s": {k: round(v, 5) for k, v in med.items()},
              "cadence_s": round(cadence, 5) if cadence is not None else None,
              "accounted_s": round(accounted, 5),
              "unaccounted_s": round(med["total"] - accounted, 5)}
    print(f"fused-epoch host attribution (median over {len(rows)} epochs):")
    for p in PHASES:
        print(f"  {p:9s} {med[p] * 1e3:8.2f} ms")
    print(f"  {'(other)':9s} {(med['total'] - accounted) * 1e3:8.2f} ms")
    if cadence is not None:
        print(f"  {'cadence':9s} {cadence * 1e3:8.2f} ms/epoch "
              f"(steady-state wall per epoch)")
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    existing[result["arm"]] = result
    out_path.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    from cardiax.utils.tpulock import tpu_lock
    with tpu_lock("profile_epoch_host"):
        main()
