#!/bin/bash
# Round-5c queue: relaunch after the 14:26 UTC container reset killed the
# r5a/r5b queues mid-flight (logs/ wiped; everything not committed lost).
#
# Differences vs r5b:
#   - EVERY slot passes use_pallas=false: the chip's Mosaic engine still
#     wedges on the whole-CEM kernel COMPILE (observed 15:05-15:15 UTC:
#     tiny canary + value kernel fine, cem_prepared compile blocks >7 min),
#     so any slot that probes it hangs at agent init. The XLA planner is
#     measured parity at this geometry (docs/PERFORMANCE.md).
#   - The venv is exported explicitly: post-reset, bare `python` resolves
#     to a package-less /usr/local interpreter.
#   - Pixels slot runs update_ratio=0.5 (commit 2c6f693): at the measured
#     ~33 env-steps/s of the 1:1 rgb loop, 675k remaining steps do not fit
#     the window; halving the update rate roughly doubles throughput and
#     softens the post-resume TD pressure that caused the r5a dip.
#
# Usage: nohup setsid bash scripts/tpu_queue_r5c.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5c.log 2>&1 &
# Stop between slots: touch .stop_queue5c
cd /root/repo || exit 1
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5c $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5c .queue_r5c_done

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5c_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5c ]; then log "stop sentinel; exiting"; exit 0; fi
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

# ---- 0: 3-min toy smoke on the real chip (update_ratio path + XLA planner;
# a broken trainer change must fail HERE, not 30 min into the pixels slot)
run smoke 420 python train.py task=toy-reach steps=1600 eval_freq=800 \
  eval_episodes=2 save_agent=false num_envs=4 update_ratio=0.5 \
  use_pallas=false
if [ $? -ne 0 ] && [ $? -ne 99 ]; then
  log "SMOKE FAILED - aborting queue (see /tmp/q_smoke.log)"
  exit 1
fi

# ---- 1: walker-walk pixels 250k -> 1M (VERDICT r4 item 1, BASELINE gate
# >=939.6 @1M). Resumes the committed r4px3 checkpoint (restored into
# logs/ by the session); refill 75k rebuilds data support updateless at
# ~180 env-steps/s before updates resume at ratio 0.5.
now=$(date +%s); REM=$(( DEADLINE - now ))
PX_TMO=$(( REM - 9600 ))   # reserve: mt30 19M + 317M + finisher + margin
if [ "$PX_TMO" -gt 16200 ]; then PX_TMO=16200; fi
if [ "$PX_TMO" -ge 3600 ]; then
  start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  run walker_rgb "$PX_TMO" python train.py task=walker-walk obs=rgb seed=1 \
    steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
    buffer_device=device exp_name=r4px3 resume=true \
    resume_refill_steps=75000 update_ratio=0.5 use_pallas=false \
    buffer_snapshot_eps=100
  stop_exporter
  px_commit "results: walker-walk pixels resumed toward 1M (r5c, update_ratio 0.5)"
else
  log "no window for the pixels slot (rem ${REM}s)"
fi

# ---- 2: mt30 medium-data 19M + 317M training demo (VERDICT item 2) ------
if [ -f datasets/mt30_medium/.complete ]; then
  mt30_slot 19 3600 40000 20000 r5-mt30-19m results/tdmpc2_tpu/mt30-medium-19m.csv
  mt30_slot 317 2700 10000 5000 r5-mt30-317m results/tdmpc2_tpu/mt30-medium-317m.csv
else
  log "mt30_medium dataset not ready; skipping mt30 slots"
fi

# ---- 3: pixels finisher if the cap killed slot 1 short of 1M ------------
if [ -f logs/walker-walk/1/r4px3/eval.csv ] && python - <<'PYEOF'
import csv, sys
rows = list(csv.DictReader(open('logs/walker-walk/1/r4px3/eval.csv')))
m = max(float(r['step']) for r in rows) if rows else 0
sys.exit(0 if 700000 <= m < 1000000 else 1)
PYEOF
then
  start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  run walker_rgb_fin 5400 python train.py task=walker-walk obs=rgb seed=1 \
    steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
    buffer_device=device exp_name=r4px3 resume=true \
    resume_refill_steps=0 update_ratio=0.5 use_pallas=false \
    buffer_snapshot_eps=100
  stop_exporter
  px_commit "results: walker-walk pixels finisher to 1M (r5c)"
fi

# ---- 4: hopper-hop long horizon (VERDICT item 3: first curve past 1.3M)
# vs cheetah seeds 2,3 (item 4): hopper only beats 1.3M given >=~85 min
# (~300 env-steps/s at nv=24), cheetah completes a whole VERDICT item in
# ~75 min — when the tail cannot fit both, pick the one that FINISHES.
now=$(date +%s); REM2=$(( DEADLINE - now - 600 ))
if [ "$REM2" -ge 10600 ]; then
  HOP_TMO=$(( REM2 - 5400 ))          # both fit
elif [ "$REM2" -ge 5000 ]; then
  HOP_TMO=$REM2                        # hopper only (higher VERDICT rank)
else
  HOP_TMO=0                            # too short for hopper to matter
fi
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
  commit_results "results: hopper-hop long-horizon curve to the step reached + resumable artifact (r5c)"
else
  log "no window for hopper-hop (rem ${HOP_TMO}s)"
fi

# ---- 5: opportunistic (cheetah completes the 10th 3-seed task) ----------
fleet_slot cheetah-run 600000 5400 2,3 12
fleet_slot walker-flip 200000 2100 1,2,3 12
fleet_slot cartpole-balance 500000 4800 1,2,3 12

log "queue r5c drained"
