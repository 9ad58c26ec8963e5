#!/bin/bash
# Round-3 session-2 queue B (follower of tpu_queue_r3c2.sh), REVISED ORDER:
# lunarlander episodic before the acrobot fleet, so the deadline squeezes
# the long acrobot slot (which exports partial curves every 20 min) instead
# of killing the short lunar run outright.
#   1. lunarlander-continuous episodic to 400k — VERDICT #5: committed curve
#      stops at 150k below the success threshold (ref success = return>200).
#   2. acrobot-swingup fleet seeds=1,2,3 to 1.3M — VERDICT #3: the r2 curve
#      (182.6 @600k, one seed) was the only one below the reference band
#      (336-377 @600k, 476-594 @1M); fresh 3-seed run on the fused megastep.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3d.sh <WAIT_PID> <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r3d.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue3d
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid to wait for (0 = no wait)}
DEADLINE=${2:?need absolute epoch deadline}

log() { echo "[q3d $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue3d

if [ "$WAIT_PID" != 0 ]; then
  log "waiting for pid $WAIT_PID to release the TPU"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "TPU free"
fi

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue3d ]; then log "stop sentinel; exiting"; exit 0; fi
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

# 1. lunarlander episodic to 400k (success threshold: return > 200)
start_exporter lunarlander-continuous r3 1
run lunar 7200 python train.py task=lunarlander-continuous episodic=true \
  seed=1 steps=400000 num_envs=8 eval_freq=25000 eval_episodes=10 \
  exp_name=r3 resume=true
stop_exporter
export_task lunarlander-continuous r3 1

# 2. acrobot 3-seed fleet to 1.3M (ref band: 476-594 @1M); deadline-capped,
#    partial curves export every 20 min
start_exporter acrobot-swingup r3 1 2 3
run acrobot_fleet 14400 python train.py task=acrobot-swingup seeds=1,2,3 \
  steps=1300000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r3 resume=true
stop_exporter
export_task acrobot-swingup r3 1 2 3
grep -h "phases" /tmp/q_acrobot_fleet.log | tail -2

log "queue B drained"
