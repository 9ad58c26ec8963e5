#!/bin/bash
# Round-5 follower queue (r5b): takes over after r5a's pixels slot.
#
# r5a is stopped via its sentinel (.stop_queue5) once the pixels resume is
# underway, so its draft mt30 slots (too-tight caps: 60k iters at
# eval_freq=10000 cannot fit 2400 s) never fire; this queue runs the
# corrected remainder of the round-5 plan in VERDICT-priority order:
#   1. mt30 medium 19M + 48M (40k iters — the ~200k-transition dataset is
#      ~50 epochs at that point; 60k did not fit the slot caps) and the
#      317M short TRAINING demo (VERDICT item 2)
#   2. cheetah-run seeds 2,3 -> 600k (item 4)
#   3. hopper-hop toward 4M (item 3): everything that remains minus ONE
#      45-min reserve — at ~200-350 env-steps/s (nv=16) the goal is to put
#      the first committed curve past 1.3M + a resumable artifact; 4M does
#      not fit this window no matter the ordering (budget in RUNLOG_r5)
#   4. walker-flip 3-seed custom-task proof (item 7; chosen over the
#      cartpole-balance top-up: validates a whole untrained layer vs
#      extending an already-converged curve)
#   5. opportunistic: cartpole-balance, cheetah-run-backwards, lunarlander
#
# Usage: nohup setsid bash scripts/tpu_queue_r5b.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r5b.log 2>&1 &
# Waits for r5a to drain (.queue_r5a_done). Stop: touch .stop_queue5b
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q5b $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue5b .queue_r5b_done

log "waiting for the pixels queue to drain (.queue_r5a2_done)"
while [ ! -f .queue_r5a2_done ]; do
  if [ -f .stop_queue5b ]; then log "stop sentinel while waiting; exit"; exit 0; fi
  sleep 60
done
log "pixels queue drained; starting r5b slots"

EXPORTER=
stop_exporter() {
  if [ -n "$EXPORTER" ]; then
    kill -- -"$EXPORTER" 2>/dev/null
    wait "$EXPORTER" 2>/dev/null
    EXPORTER=
  fi
}
trap 'stop_exporter; touch .queue_r5b_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue5b ]; then log "stop sentinel; exiting"; exit 0; fi
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
    exp_name=r5 resume=true buffer_snapshot_eps=200
  stop_exporter
  export_task "$task" r5 tdmpc2_tpu 0 "${SA[@]}"
  python scripts/strip_checkpoint.py --all r5 >/dev/null 2>&1 \
    && log "stripped checkpoints for $task"
  commit_results "results: $task fleet curves to the horizon reached (r5 queue)"
}

mt30_slot() {  # mt30_slot <size> <tmo> <steps> <evalfreq> <exp> <outfile>
  local size=$1 tmo=$2 steps=$3 ef=$4 exp=$5 outfile=$6
  run "mt30_${size}m" "$tmo" python train.py task=mt30 model_size="$size" \
    data_dir=datasets/mt30_medium steps="$steps" eval_freq="$ef" \
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
  commit_results "results: mt30 ${size}M offline run on medium-quality self-collected data (r5)"
}

# ---- 0: pixels finisher — only if r5a2's slot was cap-killed short of 1M
# (>=800k). Runs with the NEW trainer code: the refill gate makes this
# resume non-destabilizing, and ~3600s covers refill + the remaining
# updates + the final eval at 1M.
if [ -f logs/walker-walk/1/r4px3/eval.csv ] && python - <<'PYEOF'
import csv, sys
rows = list(csv.DictReader(open('logs/walker-walk/1/r4px3/eval.csv')))
m = max(float(r['step']) for r in rows) if rows else 0
sys.exit(0 if 800000 <= m < 1000000 else 1)
PYEOF
then
  start_exporter walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  run walker_rgb_fin 3600 python train.py task=walker-walk obs=rgb seed=1 \
    steps=1000000 num_envs=16 eval_freq=50000 eval_episodes=10 \
    buffer_device=device exp_name=r4px3 resume=true
  stop_exporter
  export_task walker-walk r4px3 tdmpc2_tpu-pixels 400000 1
  PXLOG=logs/walker-walk/1/r4px3
  if [ -f "$PXLOG/models/latest.pkl" ]; then
    gzip -c "$PXLOG/models/latest.pkl" \
      > results/checkpoints/full/walker-walk-rgb-s1-r4px3.pkl.gz
    cp "$PXLOG/eval.csv" \
      results/checkpoints/full/walker-walk-rgb-s1-r4px3.eval.csv
  fi
  commit_results "results: walker-walk pixels finisher to 1M (r5)"
fi

# ---- 1: mt30 medium-data scaling + 317M training demo --------------------
# (time-rebalanced after the 11:00-11:50 Mosaic-wedge incident ate ~1.5h:
# the 48M slot is CUT — 19M + 317M on the same data still give a scaling
# pair — and the 317M demo runs 10k iters; both notes go in RUNLOG_r5)
if [ -f datasets/mt30_medium/.complete ]; then
  mt30_slot 19 3600 40000 20000 r5-mt30-19m results/tdmpc2_tpu/mt30-medium-19m.csv
  mt30_slot 317 3000 10000 5000 r5-mt30-317m results/tdmpc2_tpu/mt30-medium-317m.csv
else
  log "mt30_medium dataset not ready; skipping mt30 slots"
fi

# ---- 2: cheetah seeds 2,3 -> 600k (10th 3-seed grid task) ----------------
fleet_slot cheetah-run 600000 5400 2,3 12

# ---- 3: hopper-hop toward 4M: window minus the walker-flip reserve, but
# never less than a 3000s minimum slot (at ~300 env-steps/s on nv=24 that
# is still ~0.9M steps + a resumable artifact + replay snapshot) ----------
RESERVE=2100
now=$(date +%s); REM=$(( DEADLINE - now ))
HOP_TMO=$(( REM - RESERVE ))
if [ "$HOP_TMO" -lt 3000 ]; then HOP_TMO=3000; fi
if [ "$HOP_TMO" -gt $(( REM - 900 )) ]; then HOP_TMO=$(( REM - 900 )); fi
if [ "$HOP_TMO" -gt 1200 ]; then
  # nv=24 = the proven 2x12 fleet device geometry on a single seed: megastep
  # amortizes 24 updates per dispatch (~420 env-steps/s theoretical vs ~355
  # at nv=16); per-batch policy-lag correlation grows but stays within the
  # precedented range (fleet seeds saw 12, pixels ran 16)
  start_exporter hopper-hop r5 tdmpc2_tpu 0 1
  # buffer_snapshot_eps: the deadline WILL kill this slot mid-run; the
  # replay-tail snapshot (~8 MB for hopper state) makes next round's
  # resume data-backed instead of re-seeding blind
  run hopper_hop "$HOP_TMO" python train.py task=hopper-hop seed=1 \
    steps=4000000 num_envs=24 eval_freq=50000 eval_episodes=10 \
    exp_name=r5 resume=true buffer_snapshot_eps=200
  stop_exporter
  export_task hopper-hop r5 tdmpc2_tpu 0 1
  if [ -f logs/hopper-hop/1/r5/models/latest.pkl ]; then
    mkdir -p results/checkpoints/full
    gzip -c logs/hopper-hop/1/r5/models/latest.pkl \
      > results/checkpoints/full/hopper-hop-s1-r5.pkl.gz
    cp logs/hopper-hop/1/r5/eval.csv \
      results/checkpoints/full/hopper-hop-s1-r5.eval.csv
    if [ -f logs/hopper-hop/1/r5/models/buffer.npz ]; then
      cp logs/hopper-hop/1/r5/models/buffer.npz \
        results/checkpoints/full/hopper-hop-s1-r5.buffer.npz
    fi
  fi
  commit_results "results: hopper-hop long-horizon curve to the step reached + resumable artifact (r5)"
else
  log "no window for hopper-hop (rem minus reserve ${HOP_TMO}s)"
fi

# ---- 4: walker-flip custom-task proof (3 seeds) --------------------------
fleet_slot walker-flip 200000 2100 1,2,3 12
# (if the deadline already passed, run() skips these; ordering = priority)

# ---- 5: opportunistic ----------------------------------------------------
mt30_slot 48 3600 40000 20000 r5-mt30-48m results/tdmpc2_tpu/mt30-medium-48m.csv
fleet_slot cartpole-balance 500000 4800 1,2,3 12
fleet_slot cheetah-run-backwards 300000 2700 1,2,3 12
fleet_slot lunarlander-continuous 400000 5400 1 8

log "queue r5b drained"
