#!/bin/bash
# Serialize TPU jobs behind the current TPU holder (one TPU process at a
# time: the tunneled single chip head-of-line-blocks concurrent clients).
#
# Usage: nohup setsid bash scripts/tpu_queue.sh [WAIT_PID] > /tmp/tpu_queue.log 2>&1 &
# Stop between jobs: touch /root/repo/.stop_queue
cd /root/repo || exit 1
WAIT_PID=${1:-}

log() { echo "[tpu_queue $(date -u '+%m-%d %H:%M:%S')] $*"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID to release the TPU"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "pid $WAIT_PID exited; TPU free"
  # export the pixel curve the moment the 1M run lands
  python scripts/export_results.py walker-walk 1 r2-pixels tdmpc2_tpu-pixels \
    && log "exported walker-walk pixel curve"
fi

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f .stop_queue ]; then log "stop sentinel; skipping remaining jobs"; exit 0; fi
  log "START $name: $*"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  log "DONE rc=$? $name"
}

# 1. mt30 offline on the collected real-env random-policy dataset
#    (19M model; ~40 min of the wall time is the 2x 30-task eval)
run mt30 10800 python train.py task=mt30 model_size=19 \
  data_dir=datasets/mt30_rand steps=40000 eval_freq=20000 eval_episodes=2 \
  exp_name=r2-mt30-rand seed=1
python scripts/export_results.py mt30 1 r2-mt30-rand tdmpc2_tpu 2>/dev/null

# gate: the fused CEM value kernel must compile+run on the real chip;
# otherwise fall back to the XLA planner for the state runs
UP=""
if ! timeout 600 python scripts/smoke_value_kernel.py > /tmp/q_smoke.log 2>&1; then
  UP="use_pallas=false"
  log "fused value kernel smoke FAILED -> running with use_pallas=false"
else
  log "fused value kernel smoke OK"
fi

# 2-4. broaden state-based task coverage to >=5 tasks @1M (VERDICT #4)
run cheetah 14400 python train.py task=cheetah-run num_envs=8 steps=1000000 \
  eval_freq=50000 eval_episodes=10 buffer_device=device exp_name=r2 seed=1 resume=true $UP
python scripts/export_results.py cheetah-run 1 r2

run fingerspin 14400 python train.py task=finger-spin num_envs=8 steps=1000000 \
  eval_freq=50000 eval_episodes=10 buffer_device=device exp_name=r2 seed=1 resume=true $UP
python scripts/export_results.py finger-spin 1 r2

run acrobot 14400 python train.py task=acrobot-swingup num_envs=8 steps=1000000 \
  eval_freq=50000 eval_episodes=10 buffer_device=device exp_name=r2 seed=1 resume=true $UP
python scripts/export_results.py acrobot-swingup 1 r2

# 5. second seed on the flagship task
run walker_s2 14400 python train.py task=walker-walk num_envs=8 steps=1000000 \
  eval_freq=50000 eval_episodes=10 buffer_device=device exp_name=r2 seed=2 resume=true $UP
python scripts/export_results.py walker-walk 2 r2

log "queue drained"
