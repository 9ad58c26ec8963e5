#!/bin/bash
# Round-4 follower queue: revised tail of scripts/tpu_queue_r4b.sh.
# Launched once the main queue exits after its acrobot slot (.stop_queue4 is
# touched mid-acrobot so the breadth loop never starts there); this tail
# re-plans the remaining chip night with num_envs=12 fleets (planner
# dispatches amortize over 50% more env-steps; eval needs one 12-episode
# round instead of two) to make room for the two mt30 offline runs and the
# profile capture that VERDICT r3 asks for.
#
# Slots:
#   1-5. breadth grid, 3-seed fleet x 400k: cup-catch, pendulum-swingup,
#        reacher-easy, hopper-stand, cartpole-swingup
#   6.   cheetah-run fleet seeds=2,3 to 600k (10th 3-seed task)
#   7-8. mt30 offline on the medium-quality dataset (collected on CPU from
#        today's checkpoints by scripts/collect_mt30_medium.py): 19M then
#        48M — normalized-score separation from the random-data 17.9 and
#        scaling with model size (VERDICT r3 #3)
#   9.   on-chip xprof profile capture -> docs/PROFILE_r4.md
#
# Usage: nohup setsid bash scripts/tpu_queue_r4c.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4c.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4c
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4c $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4c .queue_r4c_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4c_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4c ]; then log "stop sentinel; exiting"; exit 0; fi
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

start_exporter() {
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

# wait for the main queue to drain (it owns the chip until then)
while [ ! -f .queue_r4b_done ]; do sleep 30; done
log "main queue drained; starting follower"

# 1-5. breadth grid: 3-seed fleet x 400k each, num_envs=12
for task in cup-catch pendulum-swingup reacher-easy hopper-stand \
            cartpole-swingup; do
  name=${task//-/_}
  start_exporter "$task" r4 tdmpc2_tpu 1 2 3
  run "$name" 3600 python train.py task="$task" seeds=1,2,3 \
    steps=400000 num_envs=12 eval_freq=50000 eval_episodes=10 \
    exp_name=r4 resume=true
  stop_exporter
  export_task "$task" r4 tdmpc2_tpu 1 2 3
  python scripts/strip_checkpoint.py --all r4 >/dev/null 2>&1 \
    && log "stripped checkpoints for $task"
done

# 6. cheetah-run fleet seeds 2,3 to 600k
start_exporter cheetah-run r4 tdmpc2_tpu 2 3
run cheetah_fleet 4500 python train.py task=cheetah-run seeds=2,3 \
  steps=600000 num_envs=12 eval_freq=50000 eval_episodes=10 \
  exp_name=r4 resume=true
stop_exporter
export_task cheetah-run r4 tdmpc2_tpu 2 3
python scripts/strip_checkpoint.py --all r4 >/dev/null 2>&1

# 7-8. mt30 offline: 19M then 48M on the medium dataset (wait briefly for
# the CPU collector if it is still writing)
for _ in $(seq 1 20); do
  [ -f datasets/mt30_medium/.complete ] && break
  sleep 30
done
if ls datasets/mt30_medium/*.npz >/dev/null 2>&1; then
  run mt30_19m 1800 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
  python scripts/export_results.py mt30 1 r4-mt30
  run mt30_48m 2100 python train.py task=mt30 model_size=48 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30-48m seed=1
else
  log "no medium dataset; skipping mt30 slots"
fi

# 9. profile capture
run profile 1200 python scripts/profile_step.py --out docs/PROFILE_r4.md

log "queue r4c drained"
