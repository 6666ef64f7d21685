"""400-epoch flagship stability run with a deliberate mid-run interrupt +
resume (VERDICT r3 #3).

Three stages, all `python -m cardiax.main` subprocesses on the real TPU:

  A. uninterrupted:  400 epochs, checkpoint every 10, full metrics.jsonl;
  B1. interrupted:   same seed/config, SIGINT delivered once metric logs show
      epoch >= --interrupt-epoch (exercises the save_KeyboardInterrupt path);
  B2. resumed:       same command + --training--resume=true — restarts from
      the last finalized checkpoint and must REPLAY run A exactly from there
      (epoch-indexed shuffle + full early-stop state in the checkpoint).

Checks: (1) run A has 400 epochs, all metrics finite, no divergence
(last-50-epoch train loss <= first-50 mean); (2) run B's post-resume epochs
match run A bit-for-bit; (3) the loss curve across the B1/B2 boundary is
continuous (the resumed epochs ARE run A's). Writes summary JSON + md.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/stability_run.py \
        --epochs 400 --interrupt-epoch 150 --out exp_results/stability
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from qualify_stack import N_SUBJECTS, build_config  # noqa: E402


def _epoch_rows(jsonl: Path) -> dict[int, dict]:
    """step -> last logged train-metric row for that epoch."""
    rows: dict[int, dict] = {}
    if not jsonl.exists():
        return rows
    for line in jsonl.read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "step" in r and any(k.startswith("train/") for k in r):
            rows[int(r["step"])] = r
    return rows


def _launch(cfg_path: Path, log_path: Path,
            resume: bool = False) -> subprocess.Popen:
    """Launch with stdout appended STRAIGHT to ``log_path`` — never a PIPE.
    (Round-4 bug found the hard way: B1 used stdout=PIPE and only drained it
    after the interrupt, so the child deadlocked on a full 64 KB pipe at
    ~epoch 130 — the 'froze at epoch 126' of round 3 was this, not the
    tunnel.)"""
    cmd = [sys.executable, "-m", "cardiax.main",
           "--config-file", str(cfg_path)]
    if resume:
        cmd.append("--training--resume=true")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    with open(log_path, "a") as f:
        return subprocess.Popen(cmd, env=env, stdout=f,
                                stderr=subprocess.STDOUT, text=True)


def _drain(proc: subprocess.Popen, log_path: Path) -> int:
    del log_path  # output already streams to the log file
    return proc.wait()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--interrupt-epoch", type=int, default=150)
    ap.add_argument("--checkpoint-interval", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / "exp_results" / "stability"))
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--epoch-fuse", action="store_true",
                    help="certify the fused-epoch trainer: run all stages "
                         "with training.epoch_fuse=true (resume must still "
                         "replay bit-exactly)")
    args = ap.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data_path = out / "slices.npy"
    if not data_path.exists():
        from cardiax.data.synthetic import make_dataset, save_npy
        save_npy(str(data_path), make_dataset(
            n_subjects=N_SUBJECTS, slices_per_subject=2, h=args.h, w=args.h,
            n_frames=args.frames, seed=99))

    def make_cfg(tag: str) -> Path:
        cfg = build_config(str(data_path), out, "on", seed=2434,
                           epochs=args.epochs)
        cfg = copy.deepcopy(cfg)
        cfg["saving"] = {"save_final_model": False, "save_checkpoint": True,
                         "checkpoint_interval": args.checkpoint_interval,
                         "save_model_num": 3, "save_prediction": False,
                         "saving_dir": str(out / tag)}
        cfg["training"]["test"] = False
        if args.epoch_fuse:
            cfg["training"]["epoch_fuse"] = True
        p = out / f"cfg_{tag}.json"
        p.write_text(json.dumps(cfg, indent=1))
        return p

    from cardiax.utils.tpulock import tpu_lock

    summary: dict = {"epochs": args.epochs,
                     "interrupt_epoch": args.interrupt_epoch}

    with tpu_lock("stability_run", timeout=600):
        # ---- stage A: uninterrupted ----
        cfg_a = make_cfg("full")
        if not (out / "full" / "metrics.jsonl").exists():
            t0 = time.perf_counter()
            rc = _drain(_launch(cfg_a, out / "full.log"), out / "full.log")
            summary["full_wall_s"] = round(time.perf_counter() - t0, 1)
            assert rc == 0, f"uninterrupted run failed rc={rc}; see full.log"
        else:
            print("stage A cached (full/metrics.jsonl exists)")

        # ---- stage B1: interrupted ----
        cfg_b = make_cfg("resumed")
        b_metrics = out / "resumed" / "metrics.jsonl"
        if not b_metrics.exists() or \
                max(_epoch_rows(b_metrics), default=-1) < args.epochs - 1:
            # a partial resumed/ from a killed attempt would APPEND and
            # pollute the per-epoch rows — restart B1 from a clean slate
            if b_metrics.exists():
                import shutil
                shutil.rmtree(out / "resumed", ignore_errors=True)
                (out / "resumed.log").unlink(missing_ok=True)
            proc = _launch(cfg_b, out / "resumed.log")
            interrupted_at = None
            while proc.poll() is None:
                time.sleep(5)
                top = max(_epoch_rows(b_metrics), default=-1)
                if top >= args.interrupt_epoch:
                    interrupted_at = top
                    proc.send_signal(signal.SIGINT)   # exact-PID interrupt
                    break
            _drain(proc, out / "resumed.log")
            summary["interrupted_at_epoch"] = interrupted_at
            assert interrupted_at is not None, \
                "run B finished before the interrupt epoch was reached"
            print(f"interrupted run B at epoch ~{interrupted_at}")

            # ---- stage B2: resume ----
            t0 = time.perf_counter()
            rc = _drain(_launch(cfg_b, out / "resumed.log", resume=True),
                        out / "resumed.log")
            summary["resume_wall_s"] = round(time.perf_counter() - t0, 1)
            assert rc == 0, f"resumed run failed rc={rc}; see resumed.log"

    # ---- analysis ----
    full = _epoch_rows(out / "full" / "metrics.jsonl")
    resumed = _epoch_rows(b_metrics)
    assert len(full) == args.epochs, \
        f"uninterrupted run logged {len(full)}/{args.epochs} epochs"
    losses = [full[e]["train/total_loss"] for e in sorted(full)]
    assert all(l == l and abs(l) != float("inf") for l in losses), \
        "non-finite train loss in the uninterrupted run"
    head = sum(losses[:50]) / 50
    tail = sum(losses[-50:]) / 50
    summary["train_loss_first50_mean"] = round(head, 4)
    summary["train_loss_last50_mean"] = round(tail, 4)
    assert tail <= head, f"diverged: last-50 mean {tail} > first-50 {head}"

    # resumed run: every epoch present, and post-resume epochs EXACTLY match
    assert len(resumed) == args.epochs, \
        f"resumed run logged {len(resumed)}/{args.epochs} epochs"
    resume_start = min(e for e in resumed
                       if e > summary.get("interrupted_at_epoch", -1)
                       - args.checkpoint_interval - 1)
    mismatches = []
    n_exact = 0
    for e in sorted(resumed):
        if e < resume_start:
            continue
        for k, v in full[e].items():
            if isinstance(v, float):
                if v != resumed[e].get(k):
                    mismatches.append((e, k, v, resumed[e].get(k)))
                else:
                    n_exact += 1
    summary["resume_start_epoch"] = resume_start
    summary["post_resume_values_exact"] = n_exact
    summary["post_resume_mismatches"] = mismatches[:20]
    assert not mismatches, \
        f"resumed run diverged from uninterrupted: {mismatches[:5]}"

    summary["val_loss_final"] = full[max(full)].get("val/total_loss")
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    md = [
        "# 400-epoch stability + interrupt/resume (VERDICT r3 #3)",
        f"- epochs: {args.epochs}, interrupt at ~{summary.get('interrupted_at_epoch')}",
        f"- uninterrupted: all {len(full)} epochs finite; train loss "
        f"first-50 mean {head:.3f} -> last-50 mean {tail:.3f}",
        f"- resumed run: restarted at epoch {resume_start}, "
        f"{n_exact} post-resume metric values EXACTLY equal the "
        f"uninterrupted run (0 mismatches) — the loss curve is continuous "
        f"by bit-equality, not eyeballing",
        f"- wall: full {summary.get('full_wall_s')}s, "
        f"resume stage {summary.get('resume_wall_s')}s",
    ]
    (out / "summary.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
