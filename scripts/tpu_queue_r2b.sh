#!/bin/bash
# Round-2 continuation queue: broaden state-based task coverage (VERDICT #4).
# One TPU process at a time (CLAUDE.md); jobs are serialized here.
#
# Usage: nohup setsid bash scripts/tpu_queue_r2b.sh > /tmp/tpu_queue_r2b.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"

DEADLINE=$(( $(date +%s) + 39600 ))   # hard stop launching new jobs after 11h

log() { echo "[q $(date -u '+%m-%d %H:%M:%S')] $*"; }

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 900 ]; then log "deadline reached; skipping $name"; return 1; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  log "DONE rc=$? $name"
}

# use_pallas=false: the fused value kernel fails to lower under BATCHED
# (num_envs=8) acting on real hardware — an (n_envs, 2) smem operand gets a
# non-lane-aligned block — and the XLA planner is ~parity in-context anyway.
# Fix + re-validate via scripts/smoke_value_kernel.py (now covers batched act).
COMMON="num_envs=8 eval_freq=50000 eval_episodes=10 buffer_device=device exp_name=r2 seed=1 resume=true use_pallas=false"

run cheetah 18000 python train.py task=cheetah-run steps=1000000 $COMMON
python scripts/export_results.py cheetah-run 1 r2 && log "exported cheetah-run"

run fingerspin 10800 python train.py task=finger-spin steps=600000 $COMMON
python scripts/export_results.py finger-spin 1 r2 && log "exported finger-spin"

run acrobot 10800 python train.py task=acrobot-swingup steps=600000 $COMMON
python scripts/export_results.py acrobot-swingup 1 r2 && log "exported acrobot-swingup"

run cupcatch 7200 python train.py task=cup-catch steps=400000 $COMMON
python scripts/export_results.py cup-catch 1 r2 && log "exported cup-catch"

# bonus if the queue drained early: second walker-walk seed
run walker_s2 10800 python train.py task=walker-walk steps=600000 \
  num_envs=8 eval_freq=50000 eval_episodes=10 buffer_device=device \
  exp_name=r2 seed=2 resume=true
python scripts/export_results.py walker-walk 2 r2 && log "exported walker-walk s2"

log "queue drained"
