#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 #1,2,3,5,7,8).
# Each stage is skipped if its done-marker exists, so the queue is resumable
# after a tunnel death or session crash. All tools take the cooperative TPU
# lock internally; the queue runs them strictly sequentially (one-process rule).
#
# Usage:  bash tools/round4_queue.sh > exp_results/round4_queue.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=exp_results/round4
mkdir -p "$Q"

stage() {  # stage <name> <done-file> <cmd...>
  local name=$1 done_file=$2; shift 2
  if [ -e "$done_file" ]; then
    echo "=== [$name] SKIP (done: $done_file)"; return 0
  fi
  echo "=== [$name] START $(date -u +%H:%M:%S)"
  "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then touch "$done_file"; fi
  return $rc
}

# 1. Early driver-verifiable bench number (VERDICT #1). bench.py emits its
#    JSON on stdout; keep a copy.
stage bench_early "$Q/bench_early.done" \
  python bench.py --batch 10 20 40
[ -e "$Q/bench_early.done" ] && cp "$Q/bench_early.log" "$Q/bench_early.json.log"

# 2. Device-cache wall-clock win (VERDICT #2).
stage walltime "exp_results/walltime.json" \
  python tools/bench_walltime.py --out exp_results/walltime.json

# 3. b40 throughput-drop profile (VERDICT #8).
stage profile_b40 "$Q/profile_b40.done" \
  python tools/profile_flagship.py /tmp/cardiax_profile_b40 --batch 40
stage profile_b20 "$Q/profile_b20.done" \
  python tools/profile_flagship.py /tmp/cardiax_profile_b20 --batch 20

# 4. Fused-scan boundary probe between 256^2 and 131k px (VERDICT #7).
stage scan_boundary "$Q/scan_boundary.done" \
  python tools/probe_scan_boundary.py

# 5. 400-epoch stability + interrupt/resume (VERDICT #3). Internally staged
#    and cached; summary.json is the done marker.
stage stability "exp_results/stability/summary.json" \
  python tools/stability_run.py --epochs 400 --interrupt-epoch 150 \
      --out exp_results/stability

# 6. 5-fold CV, reference protocol (VERDICT #5).
stage cv5 "exp_results/cv5/results.json" \
  python tools/cv5_run.py --epochs 150 --out exp_results/cv5

# 7. Late bench re-confirmation (VERDICT #1: "run it early AND late").
stage bench_late "$Q/bench_late.done" \
  python bench.py
echo "=== queue complete $(date -u +%H:%M:%S)"
