"""Diff two jax.profiler trace dirs op-by-op (VERDICT r3 #8: explain b40).

Aggregates each trace with cardiax.io.profiling.summarize_trace, joins rows
by op label, and prints the ops whose per-step time grew/shrank the most —
normalized per SLICE so different batch sizes compare directly.

Usage:
    python tools/compare_profiles.py /tmp/cardiax_profile_b20 20 \
                                     /tmp/cardiax_profile_b40 40
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cardiax.io.profiling import summarize_trace  # noqa: E402


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 4:
        print(__doc__)
        return 2
    dir_a, batch_a, dir_b, batch_b = argv[0], int(argv[1]), argv[2], int(argv[3])
    sa = summarize_trace(dir_a, top_k=200)
    sb = summarize_trace(dir_b, top_k=200)
    if not sa or not sb:
        print(f"missing device events: a={bool(sa)} b={bool(sb)}")
        return 1

    def per_slice(summary, batch):
        steps = max(1, summary.get("n_steps") or 1)
        return {row["op"]: row["ms"] / steps / batch for row in summary["ops"]}

    a, b = per_slice(sa, batch_a), per_slice(sb, batch_b)
    tot_a = (sa["per_step_ms"] or 0) / batch_a
    tot_b = (sb["per_step_ms"] or 0) / batch_b
    print(f"per-slice device time: {dir_a} (b{batch_a}) {tot_a*1000:.1f} us | "
          f"{dir_b} (b{batch_b}) {tot_b*1000:.1f} us | "
          f"ratio {tot_b/tot_a if tot_a else float('nan'):.3f}")
    rows = []
    for op in sorted(set(a) | set(b)):
        ua, ub = a.get(op, 0.0) * 1000, b.get(op, 0.0) * 1000
        rows.append((ub - ua, ua, ub, op))
    rows.sort(key=lambda r: -abs(r[0]))
    print(f"{'d us/slice':>11} {'a us':>9} {'b us':>9}  op")
    for d, ua, ub, op in rows[:30]:
        print(f"{d:+11.1f} {ua:9.1f} {ub:9.1f}  {op[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
