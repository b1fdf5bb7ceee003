#!/bin/bash
# Queued on-chip experiments (run when the axon tunnel is healthy).
# Usage: bash scripts/run_tpu_queue.sh 2>&1 | tee /tmp/tpu_queue.log
set -x
cd "$(dirname "$0")/.."

# 0. tunnel health
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline bench (persistent cache warms the later runs)
timeout 1200 python bench.py

# 2. train-step: B=8 bf16 (post frozen-skip + rect-sine numbers)
timeout 1200 python scripts/bench_train_step.py 8 20 bfloat16

# 3. does remat move the B=16 spill regression?
timeout 1200 python scripts/bench_train_step.py 16 10 bfloat16
timeout 1200 python scripts/bench_train_step.py 16 10 bfloat16 remat

# 4. R50 backward attribution (the 3.0x-vs-2x headroom)
timeout 1200 python scripts/profile_r50_bwd.py

# 5. transformer backward per-layer attribution
timeout 1800 python scripts/bench_transformer_bwd_slice.py
