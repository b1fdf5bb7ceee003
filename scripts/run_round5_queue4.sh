#!/bin/bash
# Round-5 queue D — final-round schedule, rebudgeted after measuring the
# real per-run cost on this (post-host-swap, cold-cache) machine:
# s42's log shows ~50 min of bucket compiles + ~124 s/epoch pure train
# (tunnel-bound input upload), so the queue-C ordering could not fit the
# wall clock. Changes vs queue C:
#   - int8 seam SWEEP inserted right after s7 (selective allowlist is
#     the one lever that can move the 4-round serving plateau);
#   - int8 drift measured both full and selective;
#   - finetune forced to --train_short_sides 448 so every bucket is
#     warm from the s7 run (the 384/512 buckets would cost ~20 min of
#     cold compiles for a 15-min training run);
#   - baseline trimmed to 20 epochs (s42's curve peaked at 19);
#   - bench BEFORE the s1234/temporal tail so the headline artifact is
#     guaranteed; tail consumes whatever is left.
set -x
set -o pipefail
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r5 output .sentinels

for i in $(seq 1 30); do
  if timeout 120 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,)))))"; then
    break
  fi
  echo "tunnel check $i failed; retrying in 60s"; sleep 60
  [ "$i" = 30 ] && exit 1
done

step() { # step <name> <deadline_s> <cmd...>
  local name=$1 deadline=$2; shift 2
  if [ -f ".sentinels/r5_$name" ]; then echo "skip $name (sentinel)"; return 0; fi
  if python scripts/supervise.py --stall 900 --deadline "$deadline" -- \
      "$@" 2>&1 | tee "logs_r5/$name.log"; then
    touch ".sentinels/r5_$name"
    bash scripts/harvest_artifacts.sh logs_r5/artifacts || true
  else
    echo "STEP FAILED: $name" | tee -a "logs_r5/$name.log"
    return 1
  fi
}

# ---- seed 7: spread point + the round's living checkpoint ----
step oid_joint_s7 9000 \
  env EPOCHS=25 EXP_DIR=output/oid_joint_s7/ \
  bash configs/training/OID_Joint.sh --seed 7 --auto_resume
step oid_joint_s7_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best

# ---- int8: selective seam sweep + drift (full and selective) ----
step int8_sweep 3000 \
  python scripts/bench_int8_serving.py sweep
step int8_drift_oid 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best --int8
step int8_drift_oid_sel 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best \
    --int8 --int8_seams "ffn,proj,conv3x3_c128,conv3x3_c512"

# ---- north-star stretch: joint -> real-photo finetune (warm buckets) ----
step oid_finetune2 5400 \
  env EPOCHS=200 EXP_DIR=output/oid_finetune2/ \
  bash configs/training/OID_LateFusion.sh --resume output/oid_joint_s7/best \
    --lr 5e-5 --strong_aug --eval_every 10 --auto_resume \
    --train_short_sides 448
step oid_finetune2_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_finetune2/best

# ---- RGB-only ablation (depth delta; 20 ep — s42 peaked at 19) ----
step oid_joint_baseline 9000 \
  env EPOCHS=20 FUSION=Baseline USE_DEPTH=off EXP_DIR=output/oid_joint_baseline/ \
  bash configs/training/OID_Joint.sh --auto_resume
step oid_joint_baseline_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_baseline/best \
    --fusion_type Baseline

# ---- headline bench before any tail work ----
step bench_final 3000 \
  python bench.py

echo QUEUE_R5D_CORE_DONE

# ---- tail (time permitting): third seed, then temporal clean-key ----
step oid_joint_s1234 7200 \
  env EPOCHS=20 EXP_DIR=output/oid_joint_s1234/ \
  bash configs/training/OID_Joint.sh --seed 1234 --auto_resume
step oid_joint_s1234_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s1234/best

step clean_stage1 4800 \
  env EPOCHS=30 COCO_PATH=datasets/synth_rgbd \
  EXP_DIR=output/synth_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 5 --auto_resume
step clean_split_single 1500 \
  python scripts/eval_split_report.py \
    --resume output/synth_latefusion/best --coco_path datasets/synth_rgbd
step clean_stage2_unfrozen 6000 \
  env STAGE=video FREEZE=off EPOCHS=40 COCO_PATH=datasets/synth_rgbd \
  EXP_DIR=output/synth_transvodpp_unfrozen/ \
  SPATIAL_WEIGHTS=output/synth_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 3 --auto_resume
step clean_split_video_unfrozen 1500 \
  python scripts/eval_split_report.py \
    --resume output/synth_transvodpp_unfrozen/best \
    --coco_path datasets/synth_rgbd \
    --temporal_mode transvod_pp --num_ref_frames 2

echo QUEUE_R5D_DONE
