#!/bin/bash
# Round-3 session-2 queue A2: walker + finger fleet seed fills, now running
# the NEW fused actor-learner megastep (TDMPC2.vec_step / FleetAgent.step,
# CI-equivalence-tested). The first 15 minutes of the walker slot double as
# the megastep's on-chip validation: if the run crashes inside the probe
# window, the remaining slots fall back to fused_step=false (the round-2
# proven path). Probe work is real training — the full slot resumes it.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3c2.sh <WAIT_PID> <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r3c2.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue32
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid to wait for (0 = no wait)}
DEADLINE=${2:?need absolute epoch deadline}

log() { echo "[q3c2 $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue32

if [ "$WAIT_PID" != 0 ]; then
  log "waiting for pid $WAIT_PID to release the TPU"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "TPU free"
fi
rm -f .stop_queue3   # clear queue A's sentinel so nothing inherits it

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue32 ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  # 99 = deadline skip (job never ran) — callers must not read it as a crash
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

WALKER="python train.py task=walker-walk seeds=2,3 steps=1000000 num_envs=8 \
  eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true"

# 1. fused-megastep probe: run the real walker fleet for 15 min. rc=124
#    (timeout) = healthy; any other nonzero = crash -> fused_step=false.
FUSED=""
run walker_probe 900 $WALKER
rc=$?
if [ "$rc" = 124 ] || [ "$rc" = 0 ] || [ "$rc" = 99 ]; then
  log "megastep probe OK/skipped (rc=$rc); keeping fused_step=true"
else
  FUSED="fused_step=false"
  log "megastep probe FAILED rc=$rc (see /tmp/q_walker_probe.log); $FUSED"
fi
grep -h "phases" /tmp/q_walker_probe.log | tail -3

# 2. walker-walk seeds 2,3 to 1M (resumes the probe's checkpoints)
start_exporter walker-walk r3 2 3
run walker_fleet 16200 $WALKER $FUSED
stop_exporter
export_task walker-walk r3 2 3
grep -h "phases" /tmp/q_walker_fleet.log | tail -2

# 3. finger-spin seeds 2,3 to 400k (ref 987.3 @400k)
start_exporter finger-spin r3 2 3
run finger_fleet 7800 python train.py task=finger-spin seeds=2,3 \
  steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r3 resume=true $FUSED
stop_exporter
export_task finger-spin r3 2 3

log "queue A2 drained"
