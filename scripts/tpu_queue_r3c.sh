#!/bin/bash
# Round-3 session-2 queue A (post container reset: all logs/ checkpoints
# wiped, so every run below starts fresh). Priority = VERDICT r2 #2,
# "3-seed curves for >=3 tasks":
#   1. bench warm     — validate chip + pre-warm the XLA compile cache for
#                       the driver's end-of-round bench
#   2. cartpole fleet seeds=2,3 to 120k  (cheap; completes 3-seed task #1)
#   3. walker-walk fleet seeds=2,3 to 1M (ref 3-seed mean 979.7 @1M)
#   4. finger-spin fleet seeds=2,3 to 400k (ref 987.3 @400k; converges ~200k)
# A follower queue (r3d: acrobot + lunarlander) waits on this PID.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3c.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r3c.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue3
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q3c $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue3

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue3 ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 1; fi
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

# background exporter: refresh results/ every 20 min so a mid-slot kill or
# container reset cannot lose more than 20 min of curve
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

# 1. chip sanity + compile-cache warm for the driver's end-of-round bench
run benchwarm 1500 python bench.py
tail -3 /tmp/q_benchwarm.log

# 2. cartpole fleet (fleet chip validation; completes the 3-seed fill)
run cartpole_fleet 5400 python train.py task=cartpole-balance seeds=2,3 \
  steps=120000 num_envs=8 eval_freq=20000 eval_episodes=10 \
  exp_name=r3 resume=true
rc=$?
if [ "$rc" = 0 ] || [ "$rc" = 124 ]; then   # 124 = slow but healthy (timeout)
  FLEET_OK=1
  log "fleet validated on chip (rc=$rc)"
else
  FLEET_OK=0
  log "fleet FAILED on chip rc=$rc (see /tmp/q_cartpole_fleet.log); sequential fallback"
fi
export_task cartpole-balance r3 2 3

# 3. walker-walk seeds 2,3 to 1M
start_exporter walker-walk r3 2 3
if [ "$FLEET_OK" = 1 ]; then
  run walker_fleet 17100 python train.py task=walker-walk seeds=2,3 \
    steps=1000000 num_envs=8 eval_freq=50000 eval_episodes=10 \
    exp_name=r3 resume=true
else
  run walker_s2 8100 python train.py task=walker-walk seed=2 steps=1000000 \
    num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true
  run walker_s3 8100 python train.py task=walker-walk seed=3 steps=1000000 \
    num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true
fi
stop_exporter
export_task walker-walk r3 2 3

# 4. finger-spin seeds 2,3 to 400k (ref 987.3 @400k)
start_exporter finger-spin r3 2 3
if [ "$FLEET_OK" = 1 ]; then
  run finger_fleet 7800 python train.py task=finger-spin seeds=2,3 \
    steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
    exp_name=r3 resume=true
else
  run finger_s2 3900 python train.py task=finger-spin seed=2 steps=400000 \
    num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true
  run finger_s3 3900 python train.py task=finger-spin seed=3 steps=400000 \
    num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true
fi
stop_exporter
export_task finger-spin r3 2 3

log "queue A drained"
