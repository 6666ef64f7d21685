"""Profiler trace summarization: per-op device-time table from a jax.profiler
trace directory.

The reference has no tracing at all (SURVEY.md 5.1); the engine captures a
``jax.profiler`` trace of the first few steps when ``others.profile_dir`` is
set. This module turns the captured Chrome trace (``*.trace.json.gz``) into a
top-K table of device op times so step-time budgets ("shooting grad = X ms")
are reproducible artifacts, not claims.

Usage:
    python -m cardiax.io.profiling <profile_dir> [top_k]
or from the engine, which prints the summary right after ``stop_trace``.
"""

from __future__ import annotations

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, List, Optional


def _find_trace_files(profile_dir: str | Path) -> List[Path]:
    """Newest plugins/profile/<stamp>/ dir's *.trace.json.gz files."""
    root = Path(profile_dir)
    stamps = sorted((root / "plugins" / "profile").glob("*"))
    if not stamps:
        stamps = [root]
    return sorted(stamps[-1].glob("*.trace.json.gz"))


def _load_events(files: List[Path]) -> List[Dict[str, Any]]:
    events: List[Dict[str, Any]] = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            events.extend(json.load(fh).get("traceEvents", []))
    return events


def summarize_trace(profile_dir: str | Path, top_k: int = 25) -> Optional[Dict[str, Any]]:
    """Aggregate device op time from a jax.profiler trace directory.

    Returns {"total_ms", "n_steps", "per_step_ms", "ops": [...], "categories":
    [...]} or None if no trace files / no device events were captured (e.g.
    the CPU backend, which emits host-side events only).

    Op rows are grouped by the op's source label (``tf_op`` — the jaxpr
    primitive path) when present, else the HLO instruction name; time is the
    device duration summed over all executions in the trace.
    """
    files = _find_trace_files(profile_dir)
    if not files:
        return None
    events = _load_events(files)

    # device pids are announced by metadata: process_name like "/device:TPU:0"
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "/device:" in str(e.get("args", {}).get("name", ""))}
    thread_names = {(e["pid"], e.get("tid")): e.get("args", {}).get("name", "")
                    for e in events
                    if e.get("ph") == "M" and e.get("name") == "thread_name"}

    op_ms: Dict[str, float] = defaultdict(float)
    op_count: Dict[str, int] = defaultdict(int)
    cat_ms: Dict[str, float] = defaultdict(float)
    module_runs = 0
    total_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        args = e.get("args", {})
        dur_ms = float(args.get("device_duration_ps", 0)) / 1e9 \
            or float(e.get("dur", 0)) / 1e3
        if tname == "XLA Modules":
            module_runs += 1
            continue
        if tname not in ("XLA Ops", "Async XLA Ops"):
            continue
        key = str(args.get("tf_op") or e.get("name", "?")).rstrip(":")
        op_ms[key] += dur_ms
        op_count[key] += 1
        cat_ms[str(args.get("hlo_category", "?"))] += dur_ms
        total_ms += dur_ms

    if not op_ms:
        return None
    ops = sorted(op_ms, key=op_ms.get, reverse=True)
    return {
        "total_ms": total_ms,
        "n_steps": module_runs,
        "per_step_ms": total_ms / module_runs if module_runs else None,
        "ops": [{"op": k, "ms": op_ms[k], "count": op_count[k],
                 "pct": 100.0 * op_ms[k] / total_ms} for k in ops[:top_k]],
        "categories": [{"category": k, "ms": v, "pct": 100.0 * v / total_ms}
                       for k, v in sorted(cat_ms.items(), key=lambda kv: -kv[1])],
    }


def format_summary(summary: Dict[str, Any]) -> str:
    lines = []
    per_step = summary.get("per_step_ms")
    head = f"device time {summary['total_ms']:.1f} ms over {summary['n_steps']} module runs"
    if per_step:
        head += f" ({per_step:.1f} ms/run)"
    lines.append(head)
    lines.append(f"{'ms':>9}  {'%':>5}  {'n':>5}  op")
    for r in summary["ops"]:
        lines.append(f"{r['ms']:9.2f}  {r['pct']:5.1f}  {r['count']:5d}  {r['op']}")
    lines.append("-- by HLO category --")
    for r in summary["categories"]:
        lines.append(f"{r['ms']:9.2f}  {r['pct']:5.1f}         {r['category']}")
    return "\n".join(lines)


def print_trace_summary(profile_dir: str | Path, top_k: int = 25) -> None:
    summary = summarize_trace(profile_dir, top_k)
    if summary is None:
        print(f"[profiling] no device events found under {profile_dir} "
              f"(host-only trace?)")
        return
    print(f"[profiling] trace summary for {profile_dir}")
    print(format_summary(summary))


if __name__ == "__main__":
    print_trace_summary(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
