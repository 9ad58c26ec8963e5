#!/bin/bash
# Round-5 chip queue (r5a, adjusted to the live session window 2026-08-20).
#
# Differences vs the end-of-r4 draft (tpu_queue_r5.sh):
#   - container was NOT reset: the pixels checkpoint at 250k is already live
#     in logs/walker-walk/1/r4px3 and datasets/mt30_medium has .complete —
#     no restore / re-collect needed (restore kept as a fallback).
#   - mt30 slot runs all three sizes: 19M + 48M (VERDICT r4 item 2's
#     medium-data scaling ask) then the 317M short training demo.
#   - cheetah seeds 2,3 go to 600k (VERDICT item 4), not 400k.
#   - hopper-hop 4M (VERDICT item 3) runs nv=16 for throughput and takes
#     the remaining window; tail slots (cartpole-balance top-up,
#     lunarlander) only fire if hopper finishes before the deadline.
#
# Usage: nohup setsid bash scripts/tpu_queue_r5a.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5a.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue5
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5a $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5 .queue_r5a_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5a_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5 ]; then log "stop sentinel; exiting"; exit 0; fi
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

commit_results() {
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
  start_exporter "$task" r5 tdmpc2_tpu 0 "${SA[@]}"
  run "$name" "$tmo" python train.py task="$task" seeds="$seeds" \
    steps="$steps" num_envs="$nv" eval_freq=50000 eval_episodes=10 \
    exp_name=r5 resume=true
  stop_exporter
  export_task "$task" r5 tdmpc2_tpu 0 "${SA[@]}"
  python scripts/strip_checkpoint.py --all r5 >/dev/null 2>&1 \
    && log "stripped checkpoints for $task"
  commit_results "results: $task fleet curves (r5 queue)"
}

mt30_slot() {  # mt30_slot <size> <tmo> <steps> <exp> <outfile>
  local size=$1 tmo=$2 steps=$3 exp=$4 outfile=$5
  run "mt30_${size}m" "$tmo" python train.py task=mt30 model_size="$size" \
    data_dir=datasets/mt30_medium steps="$steps" eval_freq=10000 \
    eval_episodes=2 exp_name="$exp" seed=1
  python - "$exp" "$outfile" <<'PYEOF' || true
import csv, sys
exp, outfile = sys.argv[1], sys.argv[2]
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open(f'logs/mt30/1/{exp}/eval.csv'))]
with open(outfile, 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote {outfile} ({len(rows)} rows)')
PYEOF
  commit_results "results: mt30 ${size}M on medium-quality self-collected data (r5)"
}

# ---- slot 0: bench warm + bf16-rgb A/B (decides the pixels slot's flag) --
run benchwarm 900 python bench.py
BF16_FLAG=
if run bf16_smoke 900 python scripts/smoke_bf16_rgb.py 30; then
  speedup=$(grep -oP 'speedup: \K[0-9.]+' /tmp/q_bf16_smoke.log)
  log "bf16 rgb smoke OK (speedup ${speedup}x)"
  # only flip the training flag on a real win
  if python -c "import sys; sys.exit(0 if float('${speedup:-0}') >= 1.05 else 1)"; then
    BF16_FLAG="bf16_update=true"
  fi
else
  log "bf16 rgb smoke FAILED; pixels continue fp32"
fi

# ---- slot 1: pixels resume to 1M (checkpoint already live at 250k) -------
PXLOG=logs/walker-walk/1/r4px3
if [ ! -f "$PXLOG/models/latest.pkl" ] \
   && [ -f results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz ]; then
  mkdir -p "$PXLOG/models"
  gunzip -c results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz \
    > "$PXLOG/models/latest.pkl"
  cp results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv \
    "$PXLOG/eval.csv"
  log "restored pixels resume artifact (step 250k)"
fi
start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
run walker_rgb 18000 python train.py task=walker-walk obs=rgb seed=1 \
  steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
  buffer_device=device exp_name=r4px3 resume=true $BF16_FLAG
stop_exporter
export_task walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
if [ -f "$PXLOG/models/latest.pkl" ]; then
  gzip -c "$PXLOG/models/latest.pkl" \
    > results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz
  cp "$PXLOG/eval.csv" \
    results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv
fi
commit_results "results: walker-walk pixels resumed toward 1M (r5)"

# ---- slot 2: mt30 medium-data scaling (19M, 48M) + 317M training demo ----
if [ -f datasets/mt30_medium/.complete ]; then
  mt30_slot 19 2400 60000 r5-mt30-19m results/tdmpc2_tpu/mt30-medium-19m.csv
  mt30_slot 48 2700 60000 r5-mt30-48m results/tdmpc2_tpu/mt30-medium-48m.csv
  mt30_slot 317 2700 20000 r5-mt30-317m results/tdmpc2_tpu/mt30-medium-317m.csv
else
  log "mt30_medium dataset not ready; skipping mt30 slots"
fi

# ---- slot 3: cheetah seeds 2,3 -> 600k (10th 3-seed grid task) -----------
fleet_slot cheetah-run 600000 5400 2,3 12

# ---- slot 4: long-horizon hopper-hop toward 4M, remaining window ---------
start_exporter hopper-hop r5 tdmpc2_tpu 0 1
run hopper_hop 999999 python train.py task=hopper-hop seed=1 \
  steps=4000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
  exp_name=r5 resume=true
stop_exporter
export_task hopper-hop r5 tdmpc2_tpu 0 1
# keep a full resumable artifact for the next chip day
if [ -f logs/hopper-hop/1/r5/models/latest.pkl ]; then
  mkdir -p results/checkpoints/full
  gzip -c logs/hopper-hop/1/r5/models/latest.pkl \
    > results/checkpoints/full/hopper-hop-s1-r5.pkl.gz
  cp logs/hopper-hop/1/r5/eval.csv \
    results/checkpoints/full/hopper-hop-s1-r5.eval.csv
fi
commit_results "results: hopper-hop long-horizon run (r5)"

# ---- tail (only if hopper-hop finished early): top-ups -------------------
fleet_slot cartpole-balance 500000 4200 1,2,3 12
fleet_slot lunarlander-continuous 400000 5400 1 8

log "queue r5a drained"
