#!/bin/bash
# Round-3 queue: 3-seed grid fills via FLEET training (seeds=K in one
# process, tdmpc2_tpu/fleet.py) + the state tasks round 2 dropped.
#
# Job 1 doubles as the fleet's first on-chip validation: a short walker
# fleet run. If it fails (rc!=0), the queue falls back to sequential
# single-seed runs for the same seeds.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3.sh [DEADLINE_EPOCH] \
#          > /tmp/tpu_queue_r3.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue3
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
DEADLINE=${1:-$(( $(date +%s) + 39600 ))}   # default: now + 11h

log() { echo "[q3 $(date -u '+%m-%d %H:%M:%S')] $*"; }

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue3 ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 1; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  log "DONE rc=$rc $name"
  return $rc
}

COMMON="num_envs=8 eval_freq=50000 eval_episodes=10 buffer_device=device resume=true"

# 1. fleet on-chip validation: short walker fleet (seeds 2,3)
if run fleet_smoke 2700 python train.py task=walker-walk seeds=2,3 \
    steps=30000 eval_freq=10000 eval_episodes=5 num_envs=8 \
    exp_name=r3 resume=true; then
  FLEET_OK=1
  log "fleet smoke OK; using fleet runs for seed fills"
else
  FLEET_OK=0
  log "fleet smoke FAILED (see /tmp/q_fleet_smoke.log); sequential fallback"
fi

# 2. walker-walk seeds 2+3 to 600k (ref mean 979.7 @1M; walker converges
#    well before 600k) — fleet resumes the smoke's checkpoints
if [ "$FLEET_OK" = 1 ]; then
  run walker_fleet 21600 python train.py task=walker-walk seeds=2,3 \
    steps=600000 num_envs=8 eval_freq=50000 \
    eval_episodes=10 exp_name=r3 resume=true
  python scripts/export_results.py walker-walk 2 r3 && log "exported walker s2"
  python scripts/export_results.py walker-walk 3 r3 && log "exported walker s3"
else
  run walker_s2 10800 python train.py task=walker-walk steps=600000 seed=2 \
    exp_name=r3 $COMMON
  python scripts/export_results.py walker-walk 2 r3
  run walker_s3 10800 python train.py task=walker-walk steps=600000 seed=3 \
    exp_name=r3 $COMMON
  python scripts/export_results.py walker-walk 3 r3
fi

# 3. cup-catch 400k (dropped from the r2b queue)
run cupcatch 7200 python train.py task=cup-catch steps=400000 seed=1 \
  exp_name=r3 $COMMON
python scripts/export_results.py cup-catch 1 r3 && log "exported cup-catch"

# 4. cheetah-run seeds 2+3 fleet to 600k (curve dominance held 100k-900k on
#    seed 1; two more seeds pin it down)
if [ "$FLEET_OK" = 1 ]; then
  run cheetah_fleet 21600 python train.py task=cheetah-run seeds=2,3 \
    steps=600000 num_envs=8 eval_freq=50000 \
    eval_episodes=10 exp_name=r3 resume=true
  python scripts/export_results.py cheetah-run 2 r3
  python scripts/export_results.py cheetah-run 3 r3
fi

# 5. finger-spin seed 2 single (short converger)
run finger_s2 7200 python train.py task=finger-spin steps=400000 seed=2 \
  exp_name=r3 $COMMON
python scripts/export_results.py finger-spin 2 r3

log "queue drained"
