#!/bin/bash
# Round-3 TPU queue (revised after VERDICT r2): waits for the r2d queue
# process to release the chip, then runs in priority order:
#   1. benchmodes    — validate the new device-bound bench + per-mode
#                      CEM/rollout/XLA shootout on an idle chip (also
#                      pre-warms the compile cache for the driver's
#                      end-of-round bench)
#   2. cartpole fleet seeds=2,3 (doubles as the fleet's first on-chip
#                      validation; cheap third seed for a committed task)
#   3. walker-walk fleet seeds=2,3 to 1M  (VERDICT #2: 3-seed breadth)
#   4. acrobot-swingup seed 1 resume to 1.6M (VERDICT #3: only curve
#                      below reference; r2 ended 182.6 @600k vs ref 352)
#   5. finger-spin fleet seeds=2,3 to 400k
#   6. lunarlander episodic resume to 450k (VERDICT #5: success threshold)
#
# Jobs are timeout-capped against an absolute DEADLINE so the chip is free
# before the driver's end-of-round bench. eval.csv accumulates in logs/
# during each run; results are exported after every slot (and periodically
# for the long fleet slots) so a killed job still lands its curve.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3b.sh <WAIT_PID> <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r3b.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue3
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid to wait for (0 = no wait)}
DEADLINE=${2:?need absolute epoch deadline}

log() { echo "[q3 $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue3

if [ "$WAIT_PID" != 0 ]; then
  log "waiting for pid $WAIT_PID to release the TPU"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "TPU free"
fi

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

# background exporter: refresh results/ every 20 min for the named task
# so a mid-slot kill/reset cannot lose more than 20 min of curve
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

# 1. bench validation + per-mode shootout
run benchmodes 2400 python bench.py --modes
tail -4 /tmp/q_benchmodes.log

# 2. cartpole fleet (fleet's first chip hours; cheap 3-seed fill)
if run cartpole_fleet 5400 python train.py task=cartpole-balance seeds=2,3 \
    steps=120000 num_envs=8 eval_freq=20000 eval_episodes=10 \
    exp_name=r3 resume=true; then
  FLEET_OK=1
  log "fleet validated on chip"
else
  FLEET_OK=0
  log "fleet FAILED on chip (see /tmp/q_cartpole_fleet.log); sequential fallback"
fi
export_task cartpole-balance r3 2 3

# 3. walker-walk seeds 2,3 to 1M (ref 3-seed mean 979.7 @1M)
start_exporter walker-walk r3 2 3
if [ "$FLEET_OK" = 1 ]; then
  run walker_fleet 16200 python train.py task=walker-walk seeds=2,3 \
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

# 4. acrobot seed 1: resume the r2 run (600k) toward 1.6M
start_exporter acrobot-swingup r2 1
run acrobot 10800 python train.py task=acrobot-swingup seed=1 steps=1600000 \
  num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r2 resume=true
stop_exporter
export_task acrobot-swingup r2 1

# 5. finger-spin seeds 2,3 (converges ~200k; 400k is generous)
if [ "$FLEET_OK" = 1 ]; then
  run finger_fleet 9000 python train.py task=finger-spin seeds=2,3 \
    steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
    exp_name=r3 resume=true
else
  run finger_s2 9000 python train.py task=finger-spin seed=2 steps=400000 \
    num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r3 resume=true
fi
export_task finger-spin r3 2 3

# 6. lunarlander episodic: resume r2 (150k) toward the success threshold
start_exporter lunarlander-continuous r2 1
run lunar 9000 python train.py task=lunarlander-continuous episodic=true \
  seed=1 steps=450000 num_envs=4 eval_freq=25000 eval_episodes=10 \
  exp_name=r2 resume=true
stop_exporter
export_task lunarlander-continuous r2 1

log "queue drained"
