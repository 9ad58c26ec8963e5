#!/bin/bash
# Round-3 session-2 queue C (follower of tpu_queue_r3d.sh): short on-chip
# profiling capture in the post-deadline margin — an HLO-level op-time
# breakdown of plan / update / megastep (VERDICT r2 #7's trace summary),
# written to docs/PROFILE_r3.md for commit.
#
# Usage: nohup setsid bash scripts/tpu_queue_r3e.sh <WAIT_PID> > /tmp/tpu_queue_r3e.log 2>&1 &
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH}"
WAIT_PID=${1:?need pid to wait for}

log() { echo "[q3e $(date -u '+%m-%d %H:%M:%S')] $*"; }

log "waiting for pid $WAIT_PID to release the TPU"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
log "TPU free; capturing profile"
timeout 900 python scripts/profile_step.py --out docs/PROFILE_r3.md \
  > /tmp/q_profile.log 2>&1
log "DONE rc=$? profile (docs/PROFILE_r3.md)"
