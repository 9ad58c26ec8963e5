#!/bin/bash
# Round-5e queue: recovery relaunch after the pixels process lost a device
# RPC at the 750k eval boundary (17:08-17:2x UTC stall: main thread in
# futex_do_wait, 0% CPU, tunnel probe from a fresh process fast+healthy —
# the fetch was dropped, not queued). The process was killed by exact PID;
# r5c/r5d were parked via sentinels because r5c's conditional finisher
# passes resume_refill_steps=0, which is unsafe for a cross-process resume
# with no replay snapshot (the killed process ran the pre-6558d3f snapshot
# code whose one-shot gather the tunnel compiler rejected).
#
#   1. pixels restart: 700k -> 1M, refill 100k (updateless refill runs ~2x
#      faster than update-on collection, so a longer refill is both gentler
#      on the restored Q-function and cheaper in wall clock), snapshots now
#      land (per-episode gather) so a further preemption resumes data-backed
#   2. mt30 19M + 317M demo on the committed medium dataset
#   3. tail: hopper-hop long-horizon (>=1.3M) / cheetah seeds 2,3 split by
#      remaining time, as r5d
#
# Usage: nohup setsid bash scripts/tpu_queue_r5e.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5e.log 2>&1 &
# Stop between slots: touch .stop_queue5e
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5e $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5e .queue_r5e_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5e_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5e ]; then log "stop sentinel; exiting"; exit 0; fi
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

mt30_slot() {  # mt30_slot <size> <tmo> <steps> <evalfreq> <exp> <outfile>
  local size=$1 tmo=$2 steps=$3 ef=$4 exp=$5 outfile=$6
  run "mt30_${size}m" "$tmo" python train.py task=mt30 model_size="$size" \
    data_dir=datasets/mt30_medium steps="$steps" eval_freq="$ef" \
    eval_episodes=2 exp_name="$exp" seed=1 use_pallas=false
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
  commit_results "results: mt30 ${size}M offline run on medium-quality self-collected data (r5)"
}

px_commit() {
  export_task walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  PXLOG=logs/walker-walk/1/r4px3
  if [ -f "$PXLOG/models/latest.pkl" ]; then
    gzip -c "$PXLOG/models/latest.pkl" \
      > results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz
    cp "$PXLOG/eval.csv" \
      results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv
  fi
  commit_results "$1"
}

# ---- 1: pixels restart 700k -> 1M ---------------------------------------
now=$(date +%s); REM=$(( DEADLINE - now ))
PX_TMO=$(( REM - 9000 ))   # reserve: mt30 19M + 317M + tail margin
if [ "$PX_TMO" -gt 7200 ]; then PX_TMO=7200; fi
if [ "$PX_TMO" -ge 2400 ]; then
  start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  run walker_rgb2 "$PX_TMO" python train.py task=walker-walk obs=rgb seed=1 \
    steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
    buffer_device=device exp_name=r4px3 resume=true \
    resume_refill_steps=100000 update_ratio=0.5 use_pallas=false \
    buffer_snapshot_eps=100
  stop_exporter
  px_commit "results: walker-walk pixels to the step reached after the RPC-stall restart (r5e)"
else
  log "no window for the pixels restart (rem ${REM}s)"
fi

# ---- 2: mt30 medium-data 19M + 317M training demo -----------------------
if [ -f datasets/mt30_medium/.complete ]; then
  mt30_slot 19 3600 40000 20000 r5-mt30-19m results/tdmpc2_tpu/mt30-medium-19m.csv
  mt30_slot 317 2700 10000 5000 r5-mt30-317m results/tdmpc2_tpu/mt30-medium-317m.csv
else
  log "mt30_medium dataset not ready; skipping mt30 slots"
fi

# ---- 3: tail split (as r5d) ---------------------------------------------
now=$(date +%s); REM=$(( DEADLINE - now - 600 ))
if [ "$REM" -ge 9300 ]; then
  HOP_TMO=$(( REM - 4800 )); CHEETAH_TMO=4800
elif [ "$REM" -ge 5000 ]; then
  HOP_TMO=$REM; CHEETAH_TMO=0
else
  HOP_TMO=0; CHEETAH_TMO=$REM
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
  commit_results "results: hopper-hop long-horizon curve to the step reached + resumable artifact (r5e)"
fi

if [ "$CHEETAH_TMO" -gt 1200 ]; then
  fleet_slot cheetah-run 600000 "$CHEETAH_TMO" 2,3 12
fi

# leftovers (only if earlier slots finished early)
fleet_slot cartpole-balance 500000 3600 1,2,3 12
fleet_slot walker-flip 200000 2100 1,2,3 12

log "queue r5e drained"
