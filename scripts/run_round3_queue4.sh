#!/bin/bash
# Round-3 on-chip queue, part 4 (fresh machine — parts 1-3's untracked
# artifacts died with the previous host). Re-runs the two outstanding
# accuracy experiments end-to-end, then the perf benches. Logs are
# tee'd into logs_r3/ (tracked) so results survive the host.
#   1. temporal-win (VERDICT r2 task 4): stage-1 single-frame on the
#      degraded-key-frame set, split eval, stage-2 TransVOD++ video,
#      split eval -> the video>=single comparison ACCURACY.md needs.
#   2. joint synth+OID north star (task 1 attempt 2) + eval report +
#      val overlays.
#   3. perf benches (tasks 5-6).
set -x
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r3 output

timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# ---- 1. temporal win ----
timeout 3600 env EPOCHS=40 bash configs/training/SynthHard_Temporal.sh \
    --eval_every 10 2>&1 | tee logs_r3/synthhard_stage1.log

timeout 1200 python scripts/eval_split_report.py \
    --resume output/synthhard_latefusion/best \
    2>&1 | tee logs_r3/split_single.log

timeout 3600 env STAGE=video EPOCHS=12 bash configs/training/SynthHard_Temporal.sh \
    --eval_every 3 2>&1 | tee logs_r3/synthhard_stage2.log

timeout 1200 python scripts/eval_split_report.py \
    --resume output/synthhard_transvod_pp/best \
    --temporal_mode transvod_pp --num_ref_frames 2 \
    2>&1 | tee logs_r3/split_video.log

# ---- 2. joint OID north star ----
timeout 4800 bash configs/training/OID_Joint.sh 2>&1 | tee logs_r3/oid_joint.log

timeout 1200 python scripts/eval_oid_report.py \
    --resume output/oid_joint/best 2>&1 | tee logs_r3/oid_joint_eval.log

timeout 900 python scripts/demo_oid.py --out output/oid_overlays \
    --resume output/oid_joint/best --num_images 27 --keep_prob 0.3 \
    2>&1 | tee logs_r3/oid_overlays.log

# ---- 3. perf benches ----
timeout 2400 python scripts/bench_serving_breakdown.py \
    2>&1 | tee logs_r3/serving_breakdown.log
timeout 1800 python scripts/bench_train_step.py 8 20 bfloat16 noremat Baseline \
    2>&1 | tee logs_r3/train_step_baseline.log
timeout 1200 python scripts/bench_train_step.py 8 20 bfloat16 noremat LateFusion \
    2>&1 | tee logs_r3/train_step_latefusion.log
timeout 1800 python scripts/profile_r50_bwd.py 2>&1 | tee logs_r3/r50_bwd.log
echo QUEUE4_DONE
