#!/bin/bash
# Round-3 session-3 queue (container was reset mid-r3d: the acrobot fleet /
# lunarlander / mt30 slots never produced artifacts, and the finger-spin
# seeds 2,3 curves were lost before export). Rebuilt priorities:
#   1. benchwarm — chip sanity + compile-cache warm for the end-of-round
#      driver bench.
#   2. finger-spin fleet seeds=2,3 to 400k — completes the "3 seeds for
#      >=3 tasks" breadth criterion (walker x3 @1M and cartpole x3 are in).
#   3. acrobot-swingup fleet seeds=1,2,3, deadline-capped (VERDICT #3: the
#      r2 single-seed curve 182.6 @600k is the only one below the reference
#      band 336-377 @600k). Partial curves export every 20 min.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3g.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r3g.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue3g
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q3g $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue3g

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue3g ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

export_task() {  # export_task <task> <exp> <seed...>
  local task=$1 exp=$2; shift 2
  for s in "$@"; do
    python scripts/export_results.py "$task" "$s" "$exp" \
      && log "exported $task s$s"
  done
}

start_exporter() {  # start_exporter <task> <exp> <seed...>
  local task=$1 exp=$2; shift 2
  local seeds=("$@")
  (
    while sleep 1200; do
      for s in "${seeds[@]}"; do
        python scripts/export_results.py "$task" "$s" "$exp" >/dev/null 2>&1
      done
    done
  ) &
  EXPORTER=$!
}
stop_exporter() { [ -n "$EXPORTER" ] && kill "$EXPORTER" 2>/dev/null; EXPORTER=; }

# 1. chip sanity + compile warm
run benchwarm 1500 python bench.py
tail -3 /tmp/q_benchwarm.log

# 2. finger-spin fleet seeds 2,3 to 400k (pipelined fused collection)
start_exporter finger-spin r3g 2 3
run finger_fleet 5400 python train.py task=finger-spin seeds=2,3 \
  steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r3g resume=true
stop_exporter
export_task finger-spin r3g 2 3
grep -h "phases" /tmp/q_finger_fleet.log | tail -2

# 3. acrobot 3-seed fleet toward 1.3M; deadline-capped, 20-min exports
start_exporter acrobot-swingup r3g 1 2 3
run acrobot_fleet 14400 python train.py task=acrobot-swingup seeds=1,2,3 \
  steps=1300000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r3g resume=true
stop_exporter
export_task acrobot-swingup r3g 1 2 3
grep -h "phases" /tmp/q_acrobot_fleet.log | tail -2

log "queue r3g drained"
