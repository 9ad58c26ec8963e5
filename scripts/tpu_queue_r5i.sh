#!/bin/bash
# Round-5i: final slot rebalance. The third RPC stall (20:24, at 698k)
# rolled hopper back to its 650k checkpoint, so r5h's 1600 s extension
# only reaches ~1.03M. This queue gives hopper ~1900 s more (-> ~1.45M,
# eval rows safely past the 1.3M milestone) and spends the last ~25 min
# on walker-flip 3 seeds x 200k — completing the custom-task-layer proof
# (VERDICT item 7) instead of a ~170k cheetah fragment. Watchdog + retry
# throughout; deadline 22:10 leaves the chip free well before the
# driver's end-of-round bench.
#
# Usage: nohup setsid bash scripts/tpu_queue_r5i.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5i.log 2>&1 &
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}
QUIET=360

log() { echo "[q5i $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5i .queue_r5i_done

log "waiting for r5g to drain (.queue_r5h_done)"
while [ ! -f .queue_r5h_done ]; do
  if [ -f .stop_queue5i ]; then log "stop sentinel while waiting; exit"; exit 0; fi
  sleep 15
done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5i_done' EXIT

run_watched() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5i ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 500 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  local lf="/tmp/q_${name}.log"
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "$lf" 2>&1 &
  local tpid=$!
  (
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 45
      mt=$(stat -c %Y "$lf" 2>/dev/null || echo 0)
      if [ $(( $(date +%s) - mt )) -gt "$QUIET" ]; then
        cpid=$(ps --ppid "$tpid" -o pid= 2>/dev/null | head -1 | tr -d ' ')
        echo "[watchdog $(date -u '+%H:%M:%S')] $name log silent >${QUIET}s; killing ${cpid:-$tpid}"
        if [ -n "$cpid" ]; then kill "$cpid" 2>/dev/null; else kill "$tpid" 2>/dev/null; fi
        break
      fi
    done
  ) >> "/tmp/tpu_queue_r5i.log" 2>&1 &
  local wpid=$!
  wait "$tpid"; local rc=$?
  kill "$wpid" 2>/dev/null
  log "DONE rc=$rc $name"
  return $rc
}

run_retrying() {
  local name=$1 budget=$2; shift 2
  local t0 now used rc attempt=0
  t0=$(date +%s)
  while :; do
    now=$(date +%s); used=$(( now - t0 ))
    local left=$(( budget - used ))
    if [ "$left" -lt 300 ]; then log "$name budget exhausted (${used}s used)"; return 0; fi
    attempt=$(( attempt + 1 ))
    run_watched "${name}_i${attempt}" "$left" "$@"
    rc=$?
    if [ "$rc" -eq 0 ] || [ "$rc" -eq 99 ]; then return $rc; fi
    log "$name attempt $attempt ended rc=$rc; retrying with resume"
    sleep 5
  done
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
    while sleep 900; do
      for s in "$@"; do
        python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
          --min-step "$minstep" >/dev/null 2>&1
      done
    done
  ' _ "$task" "$exp" "$variant" "$minstep" "${seeds[@]}" &
  EXPORTER=$!
}

hopper_commit() {
  export_task hopper-hop r5 tdmpc2_tpu 0 1
  if [ -f logs/hopper-hop/1/r5/models/latest.pkl ]; then
    mkdir -p results/checkpoints/full
    gzip -c logs/hopper-hop/1/r5/models/latest.pkl \
      > results/checkpoints/full/hopper-hop-s1-r5.pkl.gz
    cp logs/hopper-hop/1/r5/eval.csv \
      results/checkpoints/full/hopper-hop-s1-r5.eval.csv
  fi
  commit_results "$1"
}

# ---- 0: idempotent export of whatever r5g left --------------------------
hopper_commit "results: hopper-hop curve + artifact after the r5h slot"

# ---- 1: hopper +1900 s to cross 1.3M ------------------------------------
start_exporter hopper-hop r5 tdmpc2_tpu 0 1
run_retrying hopper_hop 1900 python train.py task=hopper-hop seed=1 \
  steps=4000000 num_envs=24 eval_freq=50000 eval_episodes=10 \
  exp_name=r5 resume=true buffer_snapshot_eps=200 use_pallas=false
stop_exporter
hopper_commit "results: hopper-hop long-horizon curve past 1.3M + resumable artifact (r5i)"

# ---- 2: walker-flip 3-seed custom-task proof -----------------------------
now=$(date +%s); WF_BUDGET=$(( DEADLINE - now - 500 ))
if [ "$WF_BUDGET" -gt 800 ]; then
  start_exporter walker-flip r5 tdmpc2_tpu 0 1 2 3
  run_retrying walker_flip "$WF_BUDGET" python train.py task=walker-flip \
    seeds=1,2,3 steps=200000 num_envs=12 eval_freq=25000 eval_episodes=10 \
    exp_name=r5 resume=true buffer_snapshot_eps=200 use_pallas=false
  stop_exporter
  export_task walker-flip r5 tdmpc2_tpu 0 1 2 3
  commit_results "results: walker-flip custom-task fleet curves (r5i)"
fi

log "queue r5i drained"
