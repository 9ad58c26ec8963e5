#!/bin/bash
# Round-4 session-2 chip queue, part 2: relaunch of tpu_queue_r4d.sh after
# the planned interruption that ran the update-variant probe on chip
# (scripts/bench_update_variants.py + bench_mt_update.py). r4d's profile
# slot already landed docs/PROFILE_r4.md; every other slot moved here.
#
# Takes over from the r4c follower (stopped via its sentinel after the
# reacher-easy slot; r4c had no pixels, no collector and a stale re-profile
# slot). Waits for .queue_r4c_done before touching the chip.
#
# Slot plan (deadline-capped; run() skips when <10 min remain):
#   0. (CPU, immediate) mt30-medium collector on the checkpoints already
#      landed (cup-catch ~200k, pendulum ~320k, reacher ~380k, acrobot 600k,
#      finger 400k + random fill) so the mt30 slots have data mid-queue
#   1. walker-walk PIXELS, FRESH run r4px2 to 1M: the fast-render change
#      (shadows/reflections off at 64px: env 100.6 -> 24.6 ms per 8-step;
#      envs/dmcontrol.py render fast=True) makes a full 1M run ~2.5 h at
#      num_envs=16. Fresh instead of resuming r4px so the encoder never
#      sees a shadow-on -> shadow-off visual distribution shift.
#   2-4. top-ups to 400k: cup-catch, pendulum-swingup, reacher-easy
#   5. hopper-stand fleet 400k          } fresh breadth tasks, num_envs=12
#   6. cartpole-swingup fleet 400k      } (36-env act amortizes the RTT)
#   7. mt30 offline 19M then 48M on the medium dataset
#   8. cheetah-run fleet seeds 2,3 -> 600k (10th 3-seed task)
#   9. second pixel task: cheetah-run rgb seed 1, all remaining time
#
# Results/docs are git-committed after each export so a container reset or
# session stall cannot orphan curves (ADVICE r3 / CLAUDE.md discipline).
#
# Usage: nohup setsid bash scripts/tpu_queue_r4e.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4e.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4e
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4e $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4e .queue_r4e_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4e_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4e ]; then log "stop sentinel; exiting"; exit 0; fi
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

# 0. CPU collector immediately (niced; never touches the chip)
setsid nice -n 19 python scripts/collect_mt30_medium.py \
  --episodes-per-task 40 --out datasets/mt30_medium --nice 19 \
  > /tmp/q_mt30_collect.log 2>&1 &
log "mt30 medium collector launched on CPU (pid $!)"

# wait for the r4c follower to drain (it owns the chip until then)
while [ ! -f .queue_r4c_done ]; do sleep 30; done
log "r4c drained; starting r4e"

# 1. walker pixels FRESH r4px2 to 1M with the fast renderer
pixels_slot walker_rgb walker-walk r4px2 10800

# 2-4. top-ups to 400k (r4c's 3600s slots all hit rc=124 short of 400k)
fleet_slot cup-catch 400000 2700 1,2,3 12
fleet_slot pendulum-swingup 400000 2100 1,2,3 12
fleet_slot reacher-easy 400000 2100 1,2,3 12

# 5-6. fresh breadth tasks
fleet_slot hopper-stand 400000 4800 1,2,3 12
fleet_slot cartpole-swingup 400000 4800 1,2,3 12

# 7. mt30 offline 19M + 48M on the medium dataset
for _ in $(seq 1 30); do
  [ -f datasets/mt30_medium/.complete ] && break
  sleep 30
done
if ls datasets/mt30_medium/*.npz >/dev/null 2>&1; then
  run mt30_19m 2100 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
  python scripts/export_results.py mt30 1 r4-mt30
  commit_results "results: mt30 19M on medium-quality self-collected data"
  run mt30_48m 2400 python train.py task=mt30 model_size=48 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30-48m seed=1
  # 48M curve goes to its own file (same task+seed as the 19M run, so the
  # dedup-by-seed exporter would clobber the 19M rows)
  python - <<'EOF' || true
import csv
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open('logs/mt30/1/r4-mt30-48m/eval.csv'))]
with open('results/tdmpc2_tpu/mt30-48m.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote results/tdmpc2_tpu/mt30-48m.csv ({len(rows)} rows)')
EOF
  commit_results "results: mt30 48M scaling point"
else
  log "no medium dataset; skipping mt30 slots"
fi

# 8. cheetah seeds 2,3 -> 600k (10th 3-seed task)
fleet_slot cheetah-run 600000 4800 2,3 12

# 9. second pixel task with everything that remains (VERDICT r3 #2:
# "a second pixel task underway"); resume-capable across sessions
pixels_slot cheetah_rgb cheetah-run r4px2 $(( DEADLINE - $(date +%s) ))

log "queue r4e drained"
