#!/bin/bash
# Follower queue (replaces r2c): waits for the r2b state-task queue to
# release the TPU, then runs the remaining round-2 evidence jobs, short and
# high-value first:
#   1. smoke: on-chip validation of the batched fused value kernel AND the
#      new whole-CEM-loop kernel (agent construction probes it)
#   2. bench pre-warm: one bench.py run -> planner/update executables land
#      in the persistent compile cache the driver's end-of-round bench reuses
#   3. lunarlander episodic online run (termination head on a real env)
#   4. mt30 multi-task offline at real geometry (regenerated dataset)
#   5. walker-walk pixels seed 2 with whatever time remains (curve exported
#      every 20 min so a container reset cannot lose it)
#
# Stop sentinel is .stop_queue2 (NOT .stop_queue): .stop_queue is how we end
# the r2b queue early, and this queue consumes+removes it on handoff.
#
# Usage: nohup setsid bash scripts/tpu_queue_r2d.sh <WAIT_PID> <DEADLINE_EPOCH> \
#          > /tmp/tpu_queue_r2d.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid of the r2b queue bash}
DEADLINE=${2:?need absolute epoch deadline for starting new jobs}

log() { echo "[q2 $(date -u '+%m-%d %H:%M:%S')] $*"; }

log "waiting for pid $WAIT_PID (r2b queue) to release the TPU"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
rm -f .stop_queue   # consumed: it was only meant to end r2b early
log "r2b queue done; TPU free"

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue2 ]; then log "stop sentinel; exiting"; exit 0; fi
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 600 ]; then log "deadline reached; skipping $name"; return 1; fi
  if [ "$tmo" -gt "$rem" ]; then tmo=$rem; fi
  log "START $name (tmo=${tmo}s): $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  log "DONE rc=$? $name"
}

run smoke2 1800 python scripts/smoke_value_kernel.py
grep -h "fused value kernel\|probe failed" /tmp/q_smoke2.log | tail -2

run benchwarm 1200 python bench.py
tail -2 /tmp/q_benchwarm.log

run lunar 5400 python train.py task=lunarlander-continuous episodic=true \
  steps=150000 num_envs=4 eval_freq=25000 eval_episodes=10 exp_name=r2 \
  seed=1 resume=true
python scripts/export_results.py lunarlander-continuous 1 r2 && log "exported lunar"

run mt30 7200 python train.py task=mt30 model_size=19 \
  data_dir=datasets/mt30_rand steps=40000 eval_freq=20000 eval_episodes=2 \
  exp_name=r2-mt30-rand seed=1
python scripts/export_results.py mt30 1 r2-mt30-rand && log "exported mt30"

# periodic exporter: the pixel curve survives even if the run/session dies
(
  while sleep 1200; do
    python scripts/export_results.py walker-walk 2 r2-pixels tdmpc2_tpu-pixels \
      >/dev/null 2>&1 && log "periodic pixel-curve export"
  done
) &
EXPORTER=$!
run pixels_s2 86400 python train.py task=walker-walk obs=rgb steps=1000000 \
  num_envs=8 eval_freq=50000 eval_episodes=10 exp_name=r2-pixels seed=2 \
  resume=true
kill "$EXPORTER" 2>/dev/null
python scripts/export_results.py walker-walk 2 r2-pixels tdmpc2_tpu-pixels \
  && log "exported pixel seed 2"

log "queue drained"
