#!/bin/bash
# Round-4 session-3 chip queue. The container reset killed queue r4e/r4f
# mid-flight: the fresh walker_rgb run died right after its step-0 export
# (clobbering the committed 350k curve — restored from git, and
# export_results.py now takes --min-step so a short re-run can't clobber
# longer committed evidence again), and hopper-stand / cartpole-swingup /
# cheetah s2,3 / mt30-medium never ran. This queue re-runs the night plan
# inside a ~5.4h window.
#
# Slot plan (deadline-capped):
#   1. walker-walk PIXELS fresh r4px3 to 1M, nv=16 + fast render +
#      update_chunk=8 (~2.5-3h) — the corrupted headline result
#   2. hopper-stand fleet 400k nv=12 (grid task 8)
#   3. cartpole-swingup fleet 400k nv=12 (grid task 9)
#   4. mt30 19M offline on datasets/mt30_medium (gated on the CPU
#      collector's .complete marker; ~35 min)
#   5. cheetah-run fleet seeds 2,3 -> 600k (grid task 10)
#   6. mt30 48M offline (model-size scaling point)
#
# Usage: nohup setsid bash scripts/tpu_queue_r4g.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4g.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4g
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4g $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4g .queue_r4g_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4g_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4g ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

export_task() {  # export_task <task> <exp> <variant> <minstep> <seed...>
  local task=$1 exp=$2 variant=$3 minstep=$4; shift 4
  for s in "$@"; do
    python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
      --min-step "$minstep" && log "exported $task s$s"
  done
}

commit_results() {  # commit_results <message>
  git add results docs 2>/dev/null
  git commit -q -m "$1" results docs 2>/dev/null \
    && log "committed: $1" || true
}

start_exporter() {  # start_exporter <task> <exp> <variant> <minstep> <seed...>
  local task=$1 exp=$2 variant=$3 minstep=$4; shift 4
  local seeds=("$@")
  setsid bash -c '
    task=$1 exp=$2 variant=$3 minstep=$4; shift 4
    while sleep 1200; do
      for s in "$@"; do
        python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
          --min-step "$minstep" >/dev/null 2>&1
      done
    done
  ' _ "$task" "$exp" "$variant" "$minstep" "${seeds[@]}" &
  EXPORTER=$!
}

fleet_slot() {  # fleet_slot <task> <steps> <tmo> <seeds-csv> <nv>
  local task=$1 steps=$2 tmo=$3 seeds=$4 nv=$5
  local name=${task//-/_}
  IFS=, read -ra SA <<< "$seeds"
  start_exporter "$task" r4 tdmpc2_tpu 0 "${SA[@]}"
  run "$name" "$tmo" python train.py task="$task" seeds="$seeds" \
    steps="$steps" num_envs="$nv" eval_freq=50000 eval_episodes=10 \
    exp_name=r4 resume=true
  stop_exporter
  export_task "$task" r4 tdmpc2_tpu 0 "${SA[@]}"
  python scripts/strip_checkpoint.py --all r4 >/dev/null 2>&1 \
    && log "stripped checkpoints for $task"
  commit_results "results: $task fleet curves (r4 queue)"
}

# 1. walker pixels FRESH r4px3 to 1M. --min-step 400000 protects the
# committed 350k curve until this run has strictly longer evidence.
start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
run walker_rgb 10800 python train.py task=walker-walk obs=rgb seed=1 \
  steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
  buffer_device=device exp_name=r4px3 resume=true
stop_exporter
export_task walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
commit_results "results: walker-walk pixels curve (r4px3 fresh to 1M)"

# 2-3. remaining breadth grid tasks
fleet_slot hopper-stand 400000 4200 1,2,3 12
fleet_slot cartpole-swingup 400000 4200 1,2,3 12

# 4. mt30 19M on the medium dataset (CPU collector runs alongside; gate
# on its completion marker)
if [ -f datasets/mt30_medium/.complete ]; then
  run mt30_19m 2400 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
  # medium-data curve goes to its own file: results/tdmpc2_tpu/mt30.csv
  # holds the random-data 19M run (a different dataset, not a later seed —
  # the exporter's replace-by-seed semantics would conflate them)
  python - <<'PYEOF' || true
import csv
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open('logs/mt30/1/r4-mt30/eval.csv'))]
with open('results/tdmpc2_tpu/mt30-medium-19m.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote results/tdmpc2_tpu/mt30-medium-19m.csv ({len(rows)} rows)')
PYEOF
  commit_results "results: mt30 19M on medium-quality self-collected data"
else
  log "mt30_medium dataset not ready; skipping 19M slot"
fi

# 5. cheetah seeds 2,3 -> 600k (10th 3-seed task)
fleet_slot cheetah-run 600000 4500 2,3 12

# 6. mt30 48M scaling point
if [ -f datasets/mt30_medium/.complete ]; then
  run mt30_48m 2700 python train.py task=mt30 model_size=48 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30-48m seed=1
  python - <<'PYEOF' || true
import csv
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open('logs/mt30/1/r4-mt30-48m/eval.csv'))]
with open('results/tdmpc2_tpu/mt30-medium-48m.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote results/tdmpc2_tpu/mt30-medium-48m.csv ({len(rows)} rows)')
PYEOF
  commit_results "results: mt30 48M scaling point"
fi

log "queue r4g drained"
