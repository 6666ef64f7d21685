#!/bin/bash
# Round-4 TPU measurement queue, part B — the stages that remained after the
# session restart at 12:56 killed the original runner (exp_results/round4_
# queue.log ends at "[stability] RETRY"), plus the two probe tools and the
# fixed walltime methodology committed after part A ran:
#   - walltime2:     in-process per-epoch timing (120060c) — the original
#                    difference-of-two-runs A/B produced a negative marginal
#                    for cache=false (XLA persistent compile cache).
#   - scan_force:    probe the FUSED kernel itself above the shipped cap
#                    (part A's ladder silently measured the composite scan).
#   - warp_boundary: multi-channel full-frame warp cap ladder (384x384 crash).
#   - stability:     stage A cached; re-runs interrupt/resume (B1 froze at
#                    epoch 126 when the tunnel died).
#   - cv5:           reference-protocol 5-fold CV (VERDICT #5).
#   - bench_late:    driver-config re-confirmation (VERDICT #1).
#
# Same watchdog/retry mechanics as tools/round4_queue.sh.
# Usage:  bash tools/round4b_queue.sh > exp_results/round4b_queue.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=exp_results/round4
mkdir -p "$Q"
STALL_S=${STALL_S:-900}
STAGE_MAX_S=${STAGE_MAX_S:-14400}

newest_mtime() {
  { stat -c %Y "$1" 2>/dev/null;
    find exp_results -type f -newer "$1" -printf '%T@\n' 2>/dev/null | sort -rn | head -1; } \
    | sort -rn | head -1
}

run_watched() {
  local log=$1; shift
  setsid "$@" > "$log" 2>&1 &
  local pid=$!
  local start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local now=$(date +%s)
    if [ $((now - start)) -ge "$STAGE_MAX_S" ]; then
      echo "    watchdog: stage exceeded ${STAGE_MAX_S}s — killing group $pid"
      kill -TERM -"$pid" 2>/dev/null; sleep 10; kill -KILL -"$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 98
    fi
    local last=$(newest_mtime "$log"); last=${last%.*}; last=${last:-$start}
    if [ $((now - last)) -ge "$STALL_S" ]; then
      echo "    watchdog: no output for ${STALL_S}s — killing group $pid (tunnel freeze?)"
      kill -TERM -"$pid" 2>/dev/null; sleep 10; kill -KILL -"$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 97
    fi
  done
  wait "$pid"; return $?
}

stage() {
  local name=$1 done_file=$2; shift 2
  if [ -e "$done_file" ]; then
    echo "=== [$name] SKIP (done: $done_file)"; return 0
  fi
  echo "=== [$name] START $(date -u +%H:%M:%S)"
  run_watched "$Q/$name.log" "$@"
  local rc=$?
  if [ $rc -eq 97 ] || [ $rc -eq 98 ]; then
    echo "=== [$name] killed (rc=$rc); probing tunnel before one retry"
    if python tools/tpu_probe.py --interval 240 --max-minutes 120; then
      echo "=== [$name] RETRY $(date -u +%H:%M:%S)"
      run_watched "$Q/$name.retry2.log" "$@"
      rc=$?
    fi
  fi
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then touch "$done_file"; fi
  return $rc
}

stage walltime2 "exp_results/walltime2.json" \
  python tools/bench_walltime.py --out exp_results/walltime2.json

stage scan_force "$Q/scan_force.done" \
  python tools/probe_scan_boundary.py --force-fused \
      --shapes 320x256 384x256 448x256 512x256 384x384

stage warp_boundary "$Q/warp_boundary.done" \
  python tools/probe_warp_boundary.py

stage stability "exp_results/stability/summary.json" \
  python tools/stability_run.py --epochs 400 --interrupt-epoch 150 \
      --out exp_results/stability

stage cv5 "exp_results/cv5/results.json" \
  python tools/cv5_run.py --epochs 150 --out exp_results/cv5

stage bench_late "$Q/bench_late.done" \
  python bench.py
echo "=== queue complete $(date -u +%H:%M:%S)"
