#!/bin/bash
# Round-4 chip-day queue (draft written at the end of round 3; adjust
# deadlines at launch). Priorities per VERDICT r2 #4 + round-3 leftovers:
#   1. bench warm (compile cache + chip sanity; reads the pipelined
#      megastep_env_steps_per_s extra)
#   2. walker-walk PIXELS seed 1 to 1M — the committed pixel curve stops at
#      350k (963.9, above the ref final 939.6 @1M); with the pipelined
#      fused collection (overlap_update covers the expensive render) the
#      r2 ~32 env-steps/s should rise substantially. Periodic export.
#   3. cheetah-run fleet seeds=2,3 to 600k (band evidence for the one
#      remaining 1-seed state task)
#   4. cheetah-run PIXELS seed 1 started (second pixel task)
#   5. cup-catch + pendulum-swingup 400k (breadth fillers, deadline-capped)
#
# Also collect pi-prior "medium" mt30 data right after each slot finishes
# (checkpoints die with the container — same-day collection only):
#   python scripts/collect_mt30_random.py has the random collector; a
#   medium collector can run the policy prior (mpc=false) on CPU from
#   logs/<task>/<seed>/<exp>/models/latest.pkl.
#
# Usage: nohup setsid bash scripts/tpu_queue_r4.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4 $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4 ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

export_task() {
  local task=$1 exp=$2 variant=$3; shift 3
  for s in "$@"; do
    python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
      && log "exported $task s$s"
  done
}

start_exporter() {  # start_exporter <task> <exp> <variant> <seed...>
  local task=$1 exp=$2 variant=$3; shift 3
  local seeds=("$@")
  (
    while sleep 1200; do
      for s in "${seeds[@]}"; do
        python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
          >/dev/null 2>&1
      done
    done
  ) &
  EXPORTER=$!
}
stop_exporter() { [ -n "$EXPORTER" ] && kill "$EXPORTER" 2>/dev/null; EXPORTER=; }

# 1. chip sanity + compile warm
run benchwarm 1500 python bench.py
tail -3 /tmp/q_benchwarm.log

# 2. walker-walk pixels seed 1 to 1M
start_exporter walker-walk r4-pixels tdmpc2_tpu-pixels 1
run walker_rgb 23400 python train.py task=walker-walk obs=rgb seed=1 \
  steps=1000000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  buffer_device=device exp_name=r4-pixels resume=true
stop_exporter
export_task walker-walk r4-pixels tdmpc2_tpu-pixels 1
grep -h "phases" /tmp/q_walker_rgb.log | tail -2

# 3. cheetah-run fleet seeds 2,3 to 600k
start_exporter cheetah-run r4 tdmpc2_tpu 2 3
run cheetah_fleet 7200 python train.py task=cheetah-run seeds=2,3 \
  steps=600000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r4 resume=true
stop_exporter
export_task cheetah-run r4 tdmpc2_tpu 2 3

# 4. cheetah-run pixels seed 1 (second pixel task; deadline-capped)
start_exporter cheetah-run r4-pixels tdmpc2_tpu-pixels 1
run cheetah_rgb 14400 python train.py task=cheetah-run obs=rgb seed=1 \
  steps=1000000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  buffer_device=device exp_name=r4-pixels resume=true
stop_exporter
export_task cheetah-run r4-pixels tdmpc2_tpu-pixels 1

# 5. breadth fillers
run cupcatch 5400 python train.py task=cup-catch seed=1 steps=400000 \
  num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r4 resume=true
python scripts/export_results.py cup-catch 1 r4
run pendulum 5400 python train.py task=pendulum-swingup seed=1 \
  steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r4 resume=true
python scripts/export_results.py pendulum-swingup 1 r4

log "queue r4 drained"
