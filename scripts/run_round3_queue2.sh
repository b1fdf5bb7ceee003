#!/bin/bash
# Round-3 on-chip queue, part 2: waits for queue 1 (stage-1 synthhard +
# joint OID), then runs the temporal-win stage 2 (TransVOD++ video from
# the stage-1 spatial weights) and the RGB-only Baseline ablation of the
# joint OID run.
# Usage: bash scripts/run_round3_queue2.sh <pid-to-wait-for> 2>&1 | tee /tmp/r3_queue2.log
set -x
cd "$(dirname "$0")/.."

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 0. extend stage 1: its 30-epoch curve was still climbing steeply
#    (0.048 -> 0.271 -> 0.725 at epochs 9/19/29) — a stronger spatial
#    trunk makes the temporal comparison cleaner
timeout 2400 bash configs/training/SynthHard_Temporal.sh --eval_every 10 \
    --resume output/synthhard_latefusion/ --epochs 60 --start_epoch 30

# 1. temporal-win stage 2: TransVOD++ video over the degraded-key-frame
#    set, spatial weights from stage 1, temporal heads only
timeout 3600 env STAGE=video EPOCHS=12 \
    bash configs/training/SynthHard_Temporal.sh --eval_every 3

# 2. plain TransVOD video variant (same spatial weights) for the
#    ACCURACY table
timeout 3600 env STAGE=video EPOCHS=12 DATASET=vid_multi \
    EXP_DIR=output/synthhard_transvod/ \
    bash configs/training/SynthHard_Temporal.sh --eval_every 3

# 3. joint-OID Baseline (RGB-only) ablation
timeout 3600 env FUSION=Baseline USE_DEPTH= \
    EXP_DIR=output/oid_joint_baseline/ \
    bash configs/training/OID_Joint.sh
