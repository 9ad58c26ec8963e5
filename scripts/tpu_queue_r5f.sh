#!/bin/bash
# Round-5f tail (replaces the r5e tail, parked via sentinel): the mt30
# slots ran far ahead of schedule, leaving a ~8000-9000 s window that
# r5d/r5e's split logic would hand entirely to hopper (2.3M). Better
# marginal value: hopper capped at 4800 s (~1.4M at ~300 env-steps/s —
# past the 1.3M VERDICT ask; the extra 0.9M adds little) and cheetah
# seeds 2,3 get the remainder (~420-520k: enough to answer whether seed
# 1's 790 @1M is variance — the reference 3-seed mean @400k is ~642).
#
# Usage: nohup setsid bash scripts/tpu_queue_r5f.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5f.log 2>&1 &
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5f $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5f .queue_r5f_done

log "waiting for r5e to drain (.queue_r5e_done)"
while [ ! -f .queue_r5e_done ]; do
  if [ -f .stop_queue5f ]; then log "stop sentinel while waiting; exit"; exit 0; fi
  sleep 20
done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5f_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5f ]; then log "stop sentinel; exiting"; exit 0; fi
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

# ---- 1: hopper-hop to ~1.4M (capped so cheetah gets the rest) -----------
start_exporter hopper-hop r5 tdmpc2_tpu 0 1
run hopper_hop 4800 python train.py task=hopper-hop seed=1 \
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
commit_results "results: hopper-hop long-horizon curve to the step reached + resumable artifact (r5f)"

# ---- 2: cheetah seeds 2,3 with everything that remains ------------------
now=$(date +%s); CH_TMO=$(( DEADLINE - now - 600 ))
if [ "$CH_TMO" -gt 1200 ]; then
  fleet_slot cheetah-run 600000 "$CH_TMO" 2,3 12
fi

# leftovers (only if earlier slots finished early)
fleet_slot cartpole-balance 500000 3600 1,2,3 12
fleet_slot walker-flip 200000 2100 1,2,3 12

log "queue r5f drained"
