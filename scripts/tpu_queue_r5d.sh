#!/bin/bash
# Round-5d tail: swapped in at the mt30->tail boundary (touch .stop_queue5c,
# then launch this) so the remaining window SPLITS between hopper-hop
# (VERDICT item 3: first curve past 1.3M needs >=~80 min at ~300
# env-steps/s) and cheetah-run seeds 2,3 (item 4: completes the 10th
# 3-seed task in ~80 min) instead of r5c's hopper-takes-all logic —
# two finished VERDICT items beat one overshot. Any leftover goes to the
# cartpole-balance top-up (item 5 / BASELINE gate).
#
# Usage: nohup setsid bash scripts/tpu_queue_r5d.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5d.log 2>&1 &
# Stop between slots: touch .stop_queue5d
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5d $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5d .queue_r5d_done

log "waiting for r5c to drain (.queue_r5c_done)"
while [ ! -f .queue_r5c_done ]; do
  if [ -f .stop_queue5d ]; then log "stop sentinel while waiting; exit"; exit 0; fi
  sleep 30
done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5d_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5d ]; then log "stop sentinel; exiting"; exit 0; fi
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

fleet_slot() {  # fleet_slot <task> <steps> <tmo> <seeds-csv> <nv>
  local task=$1 steps=$2 tmo=$3 seeds=$4 nv=$5
  local name=${task//-/_}
  IFS=, read -ra SA <<< "$seeds"
  start_exporter "$task" r5 tdmpc2_tpu 0 "${SA[@]}"
  run "$name" "$tmo" python train.py task="$task" seeds="$seeds" \
    steps="$steps" num_envs="$nv" eval_freq=50000 eval_episodes=10 \
    exp_name=r5 resume=true buffer_snapshot_eps=200 use_pallas=false
  stop_exporter
  export_task "$task" r5 tdmpc2_tpu 0 "${SA[@]}"
  commit_results "results: $task fleet curves to the horizon reached (r5 queue)"
}

# ---- split the tail: hopper gets the window minus cheetah's 4800 s ------
now=$(date +%s); REM=$(( DEADLINE - now - 600 ))
if [ "$REM" -ge 9300 ]; then
  HOP_TMO=$(( REM - 4800 )); CHEETAH_TMO=4800
elif [ "$REM" -ge 5000 ]; then
  HOP_TMO=$REM; CHEETAH_TMO=0      # only hopper reaches a meaningful goal
else
  HOP_TMO=0; CHEETAH_TMO=$REM      # partial cheetah still commits evidence
fi
log "tail split: hopper ${HOP_TMO}s cheetah ${CHEETAH_TMO}s (rem ${REM}s)"

if [ "$HOP_TMO" -gt 1200 ]; then
  start_exporter hopper-hop r5 tdmpc2_tpu 0 1
  run hopper_hop "$HOP_TMO" python train.py task=hopper-hop seed=1 \
    steps=4000000 num_envs=24 eval_freq=50000 eval_episodes=10 \
    exp_name=r5 resume=true buffer_snapshot_eps=200 use_pallas=false
  stop_exporter
  export_task hopper-hop r5 tdmpc2_tpu 0 1
  if [ -f logs/hopper-hop/1/r5/models/latest.pkl ]; then
    mkdir -p results/checkpoints/full
    gzip -c logs/hopper-hop/1/r5/models/latest.pkl \
      > results/checkpoints/full/hopper-hop-s1-r5.pkl.gz
    cp logs/hopper-hop/1/r5/eval.csv \
      results/checkpoints/full/hopper-hop-s1-r5.eval.csv
  fi
  commit_results "results: hopper-hop long-horizon curve to the step reached + resumable artifact (r5d)"
fi

if [ "$CHEETAH_TMO" -gt 1200 ]; then
  fleet_slot cheetah-run 600000 "$CHEETAH_TMO" 2,3 12
fi

# leftovers (only if earlier slots finished early)
fleet_slot cartpole-balance 500000 3600 1,2,3 12
fleet_slot walker-flip 200000 2100 1,2,3 12

log "queue r5d drained"
