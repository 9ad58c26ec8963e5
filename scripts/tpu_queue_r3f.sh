#!/bin/bash
# Round-3 session-2 queue D (final): once lunarlander starts in queue B
# (tpu_queue_r3d.sh), stop B's remaining filler slots, then after B exits:
#   1. mt30 offline, 19M model, fresh 60k iterations on the regenerated
#      datasets/mt30_rand — 3 eval points of 30-task normalized score
#      (VERDICT r2 #6 asks for >=3; the committed curve has 2)
#   2. on-chip profiler capture (docs/PROFILE_r3.md)
#
# Usage: nohup setsid bash scripts/tpu_queue_r3f.sh <R3D_PID> <END_EPOCH> \
#          > /tmp/tpu_queue_r3f.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
R3D=${1:?need tpu_queue_r3d pid}
END=${2:?need absolute epoch by which the chip must be free}

log() { echo "[q3f $(date -u '+%m-%d %H:%M:%S')] $*"; }

while kill -0 "$R3D" 2>/dev/null; do sleep 30; done
log "TPU free"

# wait (bounded) for the dataset collector to finish if it is still writing
for _ in $(seq 1 20); do
  [ -f datasets/mt30_rand/.complete ] && break
  sleep 30
done
ls datasets/mt30_rand/*.npz >/dev/null 2>&1 || {
  log "no mt30 chunks; skipping mt30 slot"; SKIP_MT30=1; }

rem=$(( END - $(date +%s) - 1000 ))   # reserve 1000s for the profile slot
if [ -z "$SKIP_MT30" ] && [ "$rem" -gt 1200 ]; then
  [ "$rem" -gt 7200 ] && rem=7200
  log "START mt30 (19M, 60k iters, eval every 20k; tmo=${rem}s)"
  timeout "$rem" python train.py task=mt30 model_size=19 \
    data_dir=datasets/mt30_rand steps=60000 eval_freq=20000 \
    eval_episodes=2 exp_name=r3-mt30 seed=1 > /tmp/q_mt30.log 2>&1
  log "DONE rc=$? mt30"
  python scripts/export_results.py mt30 1 r3-mt30 && log "exported mt30"
else
  log "skipping mt30 (rem=${rem}s)"
fi

if [ $(( END - $(date +%s) )) -gt 960 ]; then
  log "capturing on-chip profile"
  timeout 900 python scripts/profile_step.py --out docs/PROFILE_r3.md \
    > /tmp/q_profile.log 2>&1
  log "DONE rc=$? profile (docs/PROFILE_r3.md)"
else
  log "skipping profile (deadline)"
fi
