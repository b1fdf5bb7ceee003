#!/bin/bash
# Round-3 on-chip queue, part 5: waits for queue 4, then
#   1. serving throughput vs batch (does the bench.py headline improve
#      at B=16/24?)
#   2. OID joint seed repeats (VERDICT r2 weak #6: 15 val boxes is
#      noisy — repeat across seeds before claiming any number)
# Usage: bash scripts/run_round3_queue5.sh <pid-to-wait-for>
set -x
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r3 output

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

timeout 2400 python scripts/bench_serving_batch.py 4 8 16 24 \
    2>&1 | tee logs_r3/serving_batch.log

for SEED in 7 1234; do
  timeout 4800 env EXP_DIR=output/oid_joint_s${SEED}/ \
      bash configs/training/OID_Joint.sh --seed ${SEED} \
      2>&1 | tee logs_r3/oid_joint_s${SEED}.log
  timeout 1200 python scripts/eval_oid_report.py \
      --resume output/oid_joint_s${SEED}/best \
      2>&1 | tee logs_r3/oid_joint_s${SEED}_eval.log
done

# RGB-only ablation of the joint run (depth-signal check on real photos)
timeout 4800 env FUSION=Baseline USE_DEPTH= \
    EXP_DIR=output/oid_joint_baseline/ bash configs/training/OID_Joint.sh \
    2>&1 | tee logs_r3/oid_joint_baseline.log
echo QUEUE5_DONE
