#!/bin/bash
# Round-3 on-chip queue, part 3: perf benches (VERDICT r2 tasks 5+6)
# after the accuracy runs of queues 1-2 release the chip.
# Usage: bash scripts/run_round3_queue3.sh <pid-to-wait-for> 2>&1 | tee /tmp/r3_queue3.log
set -x
cd "$(dirname "$0")/.."

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. serving breakdown with in-script consistent sum + decoder scan probe
timeout 2400 python scripts/bench_serving_breakdown.py

# 2. serving throughput vs batch
timeout 2400 python scripts/bench_serving_batch.py 4 8 16 24

# 3. Baseline-recipe train step (backbone TRAINED at 0.1x lr) vs LateFusion
timeout 1800 python scripts/bench_train_step.py 8 20 bfloat16 noremat Baseline
timeout 1200 python scripts/bench_train_step.py 8 20 bfloat16 noremat LateFusion

# 4. R50 backward per-op attribution (the 3.0x ratio)
timeout 1800 python scripts/profile_r50_bwd.py
