#!/bin/bash
# Round-5g tail: hopper resume + cheetah 2,3 under a STALL WATCHDOG.
#
# Twice today (pixels 17:08 at 750k, hopper 19:45 at ~350k) the tunnel
# DROPPED an in-flight device RPC: the training python parks forever in
# futex_do_wait at 0% CPU while a fresh process reaches the chip in ~1.4 s.
# A silent stall inside `timeout` burns the whole slot budget. Each slot
# here runs with a watchdog that kills the EXACT child PID (never a
# pattern) once the slot log goes silent longer than the longest legal
# quiet period (an eval pause is ~2-3.5 min -> threshold 360 s), then the
# slot RETRIES while budget remains — resume=true restores the checkpoint
# AND the replay-tail snapshot (data-backed, no refill dip).
#
# Usage: nohup setsid bash scripts/tpu_queue_r5g.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5g.log 2>&1 &
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}
QUIET=360   # log-silence threshold (must exceed the longest eval pause)

log() { echo "[q5g $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5g .queue_r5g_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5g_done' EXIT

run_watched() {  # run_watched <name> <tmo> <cmd...>: returns cmd rc; 99=skip
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5g ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  local lf="/tmp/q_${name}.log"
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "$lf" 2>&1 &
  local tpid=$!
  (
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 45
      local2_mt=$(stat -c %Y "$lf" 2>/dev/null || echo 0)
      if [ $(( $(date +%s) - local2_mt )) -gt "$QUIET" ]; then
        cpid=$(ps --ppid "$tpid" -o pid= 2>/dev/null | head -1 | tr -d ' ')
        echo "[watchdog $(date -u '+%H:%M:%S')] $name log silent >${QUIET}s; killing ${cpid:-$tpid}"
        if [ -n "$cpid" ]; then kill "$cpid" 2>/dev/null; else kill "$tpid" 2>/dev/null; fi
        break
      fi
    done
  ) >> "/tmp/tpu_queue_r5g.log" 2>&1 &
  local wpid=$!
  wait "$tpid"; local rc=$?
  kill "$wpid" 2>/dev/null
  log "DONE rc=$rc $name"
  return $rc
}

run_retrying() {  # run_retrying <name> <budget-sec> <cmd...>: retry on failure
  local name=$1 budget=$2; shift 2
  local t0 now used rc attempt=0
  t0=$(date +%s)
  while :; do
    now=$(date +%s); used=$(( now - t0 ))
    local left=$(( budget - used ))
    if [ "$left" -lt 420 ]; then log "$name budget exhausted (${used}s used)"; return 0; fi
    attempt=$(( attempt + 1 ))
    run_watched "${name}_a${attempt}" "$left" "$@"
    rc=$?
    # rc 0 = trained to its horizon; rc 99 = deadline; else stall/crash -> retry
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
    while sleep 1200; do
      for s in "$@"; do
        python scripts/export_results.py "$task" "$s" "$exp" "$variant" \
          --min-step "$minstep" >/dev/null 2>&1
      done
    done
  ' _ "$task" "$exp" "$variant" "$minstep" "${seeds[@]}" &
  EXPORTER=$!
}

# ---- 1: hopper resume (data-backed: 300k ckpt + 200-episode snapshot) ---
start_exporter hopper-hop r5 tdmpc2_tpu 0 1
run_retrying hopper_hop 3300 python train.py task=hopper-hop seed=1 \
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
commit_results "results: hopper-hop long-horizon curve continued under the stall watchdog (r5g)"

# ---- 2: cheetah seeds 2,3 with the remainder ----------------------------
now=$(date +%s); CH_BUDGET=$(( DEADLINE - now - 700 ))
if [ "$CH_BUDGET" -gt 1200 ]; then
  start_exporter cheetah-run r5 tdmpc2_tpu 0 2 3
  run_retrying cheetah_run "$CH_BUDGET" python train.py task=cheetah-run \
    seeds=2,3 steps=600000 num_envs=12 eval_freq=50000 eval_episodes=10 \
    exp_name=r5 resume=true buffer_snapshot_eps=200 use_pallas=false
  stop_exporter
  export_task cheetah-run r5 tdmpc2_tpu 0 2 3
  commit_results "results: cheetah-run seeds 2,3 curves to the horizon reached (r5g)"
fi

log "queue r5g drained"
