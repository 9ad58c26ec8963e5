#!/bin/bash
# Round-4 session-2 chip queue, part 3. r4e's walker_rgb slot died in the
# pretrain burst (RESOURCE_EXHAUSTED: 16 fused pixel update batches next to
# the 12.3 GB device ring); the cfg.update_chunk cap (commit 0134e2a)
# bounds the fused scan at 8 batches for rgb. This queue re-injects the
# pixels run and the rest of the night plan; r4e is stopped by sentinel
# after its pendulum/reacher top-ups.
#
# Slot plan (deadline-capped):
#   1. mt30 19M offline on datasets/mt30_medium (data ready; 35 min —
#      early so the medium-data result is validated while supervised)
#   2. walker-walk PIXELS fresh r4px2 to 1M, nv=16 + fast render +
#      update_chunk=8 (~2.6 h)
#   3. hopper-stand fleet 400k nv=12
#   4. cartpole-swingup fleet 400k nv=12
#   5. cheetah-run fleet seeds 2,3 -> 600k
#   6. mt30 48M offline (model-size scaling point)
#   7. second pixel task: cheetah-run rgb, remaining time
#
# Usage: nohup setsid bash scripts/tpu_queue_r4f.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4f.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4f
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4f $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4f .queue_r4f_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4f_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4f ]; then log "stop sentinel; exiting"; exit 0; fi
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

commit_results() {  # commit_results <message>
  git add results docs 2>/dev/null
  git commit -q -m "$1" results docs 2>/dev/null \
    && log "committed: $1" || true
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

fleet_slot() {  # fleet_slot <task> <steps> <tmo> <seeds-csv> <nv>
  local task=$1 steps=$2 tmo=$3 seeds=$4 nv=$5
  local name=${task//-/_}
  IFS=, read -ra SA <<< "$seeds"
  start_exporter "$task" r4 tdmpc2_tpu "${SA[@]}"
  run "$name" "$tmo" python train.py task="$task" seeds="$seeds" \
    steps="$steps" num_envs="$nv" eval_freq=50000 eval_episodes=10 \
    exp_name=r4 resume=true
  stop_exporter
  export_task "$task" r4 tdmpc2_tpu "${SA[@]}"
  python scripts/strip_checkpoint.py --all r4 >/dev/null 2>&1 \
    && log "stripped checkpoints for $task"
  commit_results "results: $task fleet curves (r4 queue)"
}

pixels_slot() {  # pixels_slot <name> <task> <exp> <tmo>
  local name=$1 task=$2 exp=$3 tmo=$4
  start_exporter "$task" "$exp" tdmpc2_tpu-pixels 1
  run "$name" "$tmo" python train.py task="$task" obs=rgb seed=1 \
    steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
    buffer_device=device exp_name="$exp" resume=true
  stop_exporter
  export_task "$task" "$exp" tdmpc2_tpu-pixels 1
  commit_results "results: $task pixels curve ($name)"
}

# wait for the r4e queue to drain (it owns the chip until then)
while [ ! -f .queue_r4e_done ]; do sleep 30; done
log "r4e drained; starting r4f"

# 1. mt30 19M on the medium dataset (collected 22:40, .complete present)
if ls datasets/mt30_medium/*.npz >/dev/null 2>&1; then
  run mt30_19m 2400 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
  python scripts/export_results.py mt30 1 r4-mt30
  commit_results "results: mt30 19M on medium-quality self-collected data"
fi

# 2. walker pixels FRESH r4px2 to 1M (fast render + update_chunk OOM fix)
pixels_slot walker_rgb walker-walk r4px2 10800

# 3-4. remaining breadth tasks
fleet_slot hopper-stand 400000 4500 1,2,3 12
fleet_slot cartpole-swingup 400000 4500 1,2,3 12

# 5. cheetah seeds 2,3 -> 600k (10th 3-seed task)
fleet_slot cheetah-run 600000 4500 2,3 12

# 6. mt30 48M scaling point
if ls datasets/mt30_medium/*.npz >/dev/null 2>&1; then
  run mt30_48m 2400 python train.py task=mt30 model_size=48 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30-48m seed=1
  # 48M curve goes to its own file (same task+seed as the 19M run, so the
  # dedup-by-seed exporter would clobber the 19M rows)
  python - <<'PYEOF' || true
import csv
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open('logs/mt30/1/r4-mt30-48m/eval.csv'))]
with open('results/tdmpc2_tpu/mt30-48m.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote results/tdmpc2_tpu/mt30-48m.csv ({len(rows)} rows)')
PYEOF
  commit_results "results: mt30 48M scaling point"
fi

# 7. second pixel task with everything that remains
pixels_slot cheetah_rgb cheetah-run r4px2 $(( DEADLINE - $(date +%s) ))

log "queue r4f drained"
