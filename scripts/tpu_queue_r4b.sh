#!/bin/bash
# Round-4 chip queue (launched at round start, ~10.3h budget).
# Priorities per VERDICT r3 "Next round":
#   1. walker-walk PIXELS seed 1 to 1M (checkpoint was lost at 350k; fresh
#      run, capped 3.75h, periodic export + resume-capable for a later slot)
#   2. acrobot fleet seeds=1,2,3 RESUME 400k -> 1M (re-establishes the 600k
#      reference-band comparison lost per ADVICE r3; checkpoints survive in
#      logs/acrobot-swingup/*/r3g/)
#   3. breadth grid: cup-catch, pendulum-swingup, reacher-easy, hopper-stand,
#      cartpole-swingup — 3-seed fleet x 400k each (reaches the >=10-task
#      3-seed grid together with cheetah seeds 2,3)
#   4. cheetah-run fleet seeds=2,3 to 600k (band around the seed-1 1M curve)
#   5. on-chip xprof profile capture (replaces the artifact lost in r3)
#
# ADVICE r3 fixes incorporated: EXIT trap reaps the exporter; exporter runs
# under setsid and is killed by process group + waited, so no in-flight
# export_results.py can race the foreground export.
#
# Usage: nohup setsid bash scripts/tpu_queue_r4b.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4b.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4 $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4 .queue_r4b_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4b_done' EXIT

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
  setsid bash -c '
    task=$1 exp=$2 variant=$3; shift 3
    while sleep 1200; do
      for s in "$@"; do
        python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
          >/dev/null 2>&1
      done
    done
  ' _ "$task" "$exp" "$variant" "${seeds[@]}" &
  EXPORTER=$!
}

# 1. chip sanity + compile warm
run benchwarm 1500 python bench.py
tail -3 /tmp/q_benchwarm.log

# 2. walker-walk pixels seed 1 to 1M (fresh; old ckpt lost at 350k)
start_exporter walker-walk r4px tdmpc2_tpu-pixels 1
run walker_rgb 13500 python train.py task=walker-walk obs=rgb seed=1 \
  steps=1000000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  buffer_device=device exp_name=r4px resume=true
stop_exporter
export_task walker-walk r4px tdmpc2_tpu-pixels 1
grep -h "phases" /tmp/q_walker_rgb.log | tail -2

# 3. acrobot fleet resume 400k -> 1M
start_exporter acrobot-swingup r3g tdmpc2_tpu 1 2 3
run acrobot_fleet 5700 python train.py task=acrobot-swingup seeds=1,2,3 \
  steps=1000000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r3g resume=true
stop_exporter
export_task acrobot-swingup r3g tdmpc2_tpu 1 2 3

# 4. breadth grid: 3-seed fleet x 400k each
for task in cup-catch pendulum-swingup reacher-easy hopper-stand \
            cartpole-swingup; do
  name=${task//-/_}
  start_exporter "$task" r4 tdmpc2_tpu 1 2 3
  run "$name" 3900 python train.py task="$task" seeds=1,2,3 \
    steps=400000 num_envs=8 eval_freq=50000 eval_episodes=10 \
    exp_name=r4 resume=true
  stop_exporter
  export_task "$task" r4 tdmpc2_tpu 1 2 3
done

# 5. cheetah-run fleet seeds 2,3 to 600k
start_exporter cheetah-run r4 tdmpc2_tpu 2 3
run cheetah_fleet 4500 python train.py task=cheetah-run seeds=2,3 \
  steps=600000 num_envs=8 eval_freq=50000 eval_episodes=10 \
  exp_name=r4 resume=true
stop_exporter
export_task cheetah-run r4 tdmpc2_tpu 2 3

# 6. on-chip profile capture (replaces the r3 lost artifact)
run profile 1200 python scripts/profile_step.py --out docs/PROFILE_r4.md

log "queue r4b drained"
