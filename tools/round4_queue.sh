#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 #1,2,3,5,7,8).
# Each stage is skipped if its done-marker exists, so the queue is resumable
# after a tunnel death or session crash. All tools take the cooperative TPU
# lock internally; the queue runs them strictly sequentially (one-process rule).
#
# Stall watchdog: the axon tunnel's observed failure mode is a FREEZE (child
# alive at ~5% CPU, output stops — CLAUDE.md), so every stage runs in its own
# process group under a monitor that kills the group if neither the stage log
# nor anything under exp_results/ has been modified for STALL_S seconds. A
# killed stage gets ONE retry after tpu_probe confirms the tunnel answers
# again (all long tools cache completed sub-stages, so retries resume).
#
# Usage:  bash tools/round4_queue.sh > exp_results/round4_queue.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=exp_results/round4
mkdir -p "$Q"
STALL_S=${STALL_S:-900}
STAGE_MAX_S=${STAGE_MAX_S:-14400}

newest_mtime() {  # newest mtime among the stage log and exp_results
  { stat -c %Y "$1" 2>/dev/null;
    find exp_results -type f -newer "$1" -printf '%T@\n' 2>/dev/null | sort -rn | head -1; } \
    | sort -rn | head -1
}

run_watched() {  # run_watched <log> <cmd...>; rc 0 ok, 97 stalled, 98 timeout
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

stage() {  # stage <name> <done-file> <cmd...>
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
      run_watched "$Q/$name.retry.log" "$@"
      rc=$?
    fi
  fi
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

# 4. Fused-scan boundary probe between 256^2 and 131k px (VERDICT #7):
#    ladder in Mosaic-friendly steps (w mult of 128, h mult of 8 -> 64).
stage scan_boundary "$Q/scan_boundary.done" \
  python tools/probe_scan_boundary.py \
      --shapes 256x256 320x256 384x256 448x256 512x256 384x384 512x512

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
