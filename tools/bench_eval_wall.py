"""Full-dataset inference WALL-CLOCK throughput: eval_pipeline on vs off.

The device eval step is ~5 ms, but the reference-parity test/export loop
(engine.test) also downloads every batch's full prediction dict (strainmat,
TOS, displacement video, ...) over the tunneled PCIe and unpacks it on the
host. Synchronously, dispatch -> compute -> transfer -> host unpack
serialize per batch; with `eval_pipeline` (default ON) batch k+1's eval
step is dispatched before batch k's predictions are read, so compute and
transfer overlap — the same finding the training loop exploits via
epoch_pipeline. Bit-exactness is pinned in tests/test_eval_pipeline.py.

Headline: **inference slices/sec (wall)** over the full 96-slice synthetic
set (128x128, T=20) at the production batch sizes.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_eval_wall.py \
        --out exp_results/eval_wall.json
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "exp_results" / "eval_wall.json"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--batches", nargs="+", type=int, default=[10, 20])
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args(argv)

    out_path = Path(args.out)
    out_dir = out_path.parent / "eval_wall_runs"
    out_dir.mkdir(parents=True, exist_ok=True)

    data_path = out_dir / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=N_SUBJECTS, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))

    from cardiax.data import load_data
    from cardiax.data.datasets import build_datasets
    from cardiax.data.split import split_data
    from cardiax.models import build_model
    from cardiax.train import build_trainer
    from cardiax.utils.tpulock import tpu_lock

    cfg = build_config(str(data_path), out_dir, "on", seed=2434, epochs=1)
    cfg["training"]["test"] = False
    cfg["saving"]["saving_dir"] = str(out_dir / "setup_run")

    results: dict = {"reps": args.reps, "dataset_slices": None, "batches": {}}
    with tpu_lock("bench_eval_wall", timeout=600):
        all_data = load_data(cfg["data"], cfg)
        data_splits = split_data(all_data, cfg["data_split"])
        datasets = build_datasets(cfg["datasets"], data_splits, cfg)
        # evaluate over the WHOLE 96-slice set: reuse every split as one
        # target by pointing "test" at train+val+test concatenated
        networks = {n: build_model(mc) for n, mc in cfg["networks"].items()}
        trainer = build_trainer(cfg["training"], None, cfg)
        trained, _ = trainer.train(models=networks, datasets=datasets,
                                   trainer_config=cfg["training"],
                                   full_config=cfg)

        n_slices = len(datasets["test"].data) + len(datasets["train"].data) \
            + len(datasets["val"].data)
        results["dataset_slices"] = n_slices

        for bs in args.batches:
            row: dict = {}
            for mode in (True, False):
                tc = copy.deepcopy(cfg["training"])
                tc["batch_size"] = bs
                tc["eval_pipeline"] = mode
                walls = []
                for rep in range(args.reps + 1):
                    t0 = time.perf_counter()
                    n_pred = 0
                    for tgt in ("train", "val", "test"):
                        preds, _, _ = trainer.test(
                            models=trained, datasets=datasets,
                            trainer_config=tc, full_config=cfg,
                            target_dataset=tgt)
                        n_pred += len(preds)
                    walls.append(time.perf_counter() - t0)
                    assert n_pred == n_slices, (n_pred, n_slices)
                meas = walls[1:]   # rep 0 warms the jit cache for this batch
                med = statistics.median(meas)
                key = "pipelined" if mode else "synchronous"
                row[key] = {
                    "wall_s_median": round(med, 4),
                    "wall_s_all": [round(w, 4) for w in meas],
                    "slices_per_sec_wall": round(n_slices / med, 1),
                }
                print(f"b{bs} {key}: {med:.3f} s for {n_slices} slices "
                      f"=> {n_slices / med:.1f} slices/sec (wall)", flush=True)
            row["speedup"] = round(
                row["synchronous"]["wall_s_median"]
                / row["pipelined"]["wall_s_median"], 3)
            print(f"b{bs} eval_pipeline speedup: {row['speedup']}x", flush=True)
            results["batches"][str(bs)] = row

    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
