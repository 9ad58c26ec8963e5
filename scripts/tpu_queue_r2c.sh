#!/bin/bash
# Follower queue: waits for the r2b state-task queue to release the TPU,
# then validates the batched fused kernel on chip and runs the remaining
# round-2 evidence jobs (mt30 offline, episodic real-env, pixel seed 2).
#
# Usage: nohup setsid bash scripts/tpu_queue_r2c.sh <WAIT_PID> <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r2c.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid of the r2b queue bash}
DEADLINE=${2:?need absolute epoch deadline for starting new jobs}

log() { echo "[q2 $(date -u '+%m-%d %H:%M:%S')] $*"; }

log "waiting for pid $WAIT_PID (r2b queue) to release the TPU"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
log "r2b queue done; TPU free"

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

# 1. on-chip validation of the batched fused value kernel (round-2 fix)
run smoke2 900 python scripts/smoke_value_kernel.py
grep -h "fused value kernel" /tmp/q_smoke2.log | tail -1

# 2. mt30 multi-task offline on the regenerated random-policy dataset
run mt30 10800 python train.py task=mt30 model_size=19 \
  data_dir=datasets/mt30_rand steps=40000 eval_freq=20000 eval_episodes=2 \
  exp_name=r2-mt30-rand seed=1
python scripts/export_results.py mt30 1 r2-mt30-rand && log "exported mt30"

# 3. episodic online RL on a real env (termination head + terminated
#    bootstrap end-to-end; lunarlander success = cum reward > 200)
run lunar 7200 python train.py task=lunarlander-continuous steps=150000 \
  num_envs=4 eval_freq=25000 eval_episodes=10 exp_name=r2 seed=1 resume=true
python scripts/export_results.py lunarlander-continuous 1 r2 && log "exported lunar"

# 4. remaining time: second pixel seed (replication evidence for the
#    round-2 pixels-to-parity headline; exports whatever depth it reaches)
run pixels_s2 86400 python train.py task=walker-walk obs=rgb steps=1000000 \
  num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r2-pixels seed=2 \
  resume=true
python scripts/export_results.py walker-walk 2 r2-pixels tdmpc2_tpu-pixels \
  && log "exported pixel seed 2"

log "queue drained"
