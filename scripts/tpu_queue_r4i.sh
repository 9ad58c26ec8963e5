#!/bin/bash
# Round-4 session-4 gap queue: re-run the two mt30 slots that crashed in
# r4h (multitask lockstep eval hit the CEM-kernel vmap guard; fixed in
# bdae629) plus the short hardware probes, in the window between r4h's
# drain (~07:40) and the end-of-round driver bench. steps=40000 matches
# the committed random-data curve's horizon for a direct comparison.
#
# Usage: nohup setsid bash scripts/tpu_queue_r4i.sh <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r4i.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:?need absolute epoch deadline}

log() { echo "[q4i $(date -u '+%m-%d %H:%M:%S')] $*"; }
rm -f .stop_queue4i .queue_r4i_done
trap 'touch .queue_r4i_done' EXIT

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue4i ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 300 ]; then log "deadline reached; skipping $name"; return 99; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

export_mt30() {  # export_mt30 <exp> <outfile>
  python - "$1" "$2" <<'PYEOF' || true
import csv, sys
exp, out = sys.argv[1], sys.argv[2]
rows = [dict(step=r['step'], reward=r['episode_reward'], seed='1')
        for r in csv.DictReader(open(f'logs/mt30/1/{exp}/eval.csv'))]
with open(f'results/tdmpc2_tpu/{out}', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=['step', 'reward', 'seed'])
    w.writeheader(); w.writerows(rows)
print(f'wrote results/tdmpc2_tpu/{out} ({len(rows)} rows)')
PYEOF
}

commit_results() {
  git add results docs 2>/dev/null
  git commit -q -m "$1" results docs 2>/dev/null \
    && log "committed: $1" || true
}

log "waiting for r4h drain marker"
while [ ! -f .queue_r4h_done ]; do
  if [ -f .stop_queue4i ]; then log "stop sentinel while waiting; exiting"; exit 0; fi
  sleep 20
done
log "r4h drained; taking the chip"

if [ -f datasets/mt30_medium/.complete ]; then
  run mt30_19m 1800 python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_medium steps=40000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30 seed=1
  export_mt30 r4-mt30 mt30-medium-19m.csv
  commit_results "results: mt30 19M on medium-quality self-collected data"

  run mt30_48m 1500 python train.py task=mt30 model_size=48 \
    data_dir=datasets/mt30_medium steps=40000 eval_freq=20000 \
    eval_episodes=2 exp_name=r4-mt30-48m seed=1
  export_mt30 r4-mt30-48m mt30-medium-48m.csv
  commit_results "results: mt30 48M scaling point"
else
  log "mt30_medium dataset missing; skipping mt30 slots"
fi

run bf16_smoke 720 python scripts/smoke_bf16_rgb.py 20
run px_profile 600 python scripts/profile_pixel_update.py 50000

log "queue r4i drained"
