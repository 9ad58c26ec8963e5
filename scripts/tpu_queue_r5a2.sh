#!/bin/bash
# Round-5 pixels restart (r5a2): the first r5a pixels resume collapsed its
# own policy (eval 923 -> collection reward 85 within 8k steps) because the
# trainer ran the normal 1-update-per-step rate against the 16-episode
# fresh buffer right after resume. Fixed by cfg.resume_refill_steps (no
# updates until the restored policy re-collects a refill window); this
# queue restarts the slot from the intact 250k checkpoint with a
# double-size 50k window (belt and braces for the headline run), then
# hands off to tpu_queue_r5b.sh via .queue_r5a2_done.
#
# Usage: nohup setsid bash scripts/tpu_queue_r5a2.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5a2.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5a2 $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .queue_r5a2_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5a2_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

start_exporter() {
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
  buffer_device=device exp_name=r4px3 resume=true resume_refill_steps=50000
stop_exporter
python scripts/export_results.py walker-walk 1 r4px3 tdmpc2_tpu-pixels \
  --min-step 400000 && log "exported walker-walk pixels"
if [ -f "$PXLOG/models/latest.pkl" ] \
   && [ -f "$PXLOG/eval.csv" ] \
   && python - <<'PYEOF'
import csv, sys
rows = list(csv.DictReader(open('logs/walker-walk/1/r4px3/eval.csv')))
sys.exit(0 if rows and float(rows[-1]['step']) > 400000 else 1)
PYEOF
then
  gzip -c "$PXLOG/models/latest.pkl" \
    > results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz
  cp "$PXLOG/eval.csv" \
    results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv
  git add results docs 2>/dev/null
  git commit -q -m "results: walker-walk pixels curve + checkpoint past 400k (r5 resume)" \
    results docs 2>/dev/null && log "committed pixels results" || true
else
  log "run ended at/below 400k; keeping the 250k artifact untouched"
fi

log "r5a2 drained"
