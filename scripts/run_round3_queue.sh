#!/bin/bash
# Round-3 on-chip queue: waits for the live OID finetune (PID $1) to
# finish, then runs the temporal-win stage 1 and the joint OID run.
# Usage: bash scripts/run_round3_queue.sh <pid-to-wait-for> 2>&1 | tee /tmp/r3_queue.log
set -x
cd "$(dirname "$0")/.."

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

# tunnel health
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. temporal-win stage 1: single-frame LateFusion on synth_rgbd_hard
#    (same shapes as Synth_LateFusion -> compile cache warm)
timeout 2400 bash configs/training/SynthHard_Temporal.sh --eval_every 10

# 2. joint synth+OID north-star run
timeout 3600 bash configs/training/OID_Joint.sh
