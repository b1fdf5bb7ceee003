#!/bin/bash
# Round-5 queue C — rebuilt after the mid-round host swap wiped output/
# (all checkpoints) and .jax_cache. Triaged for the remaining wall
# clock, highest judge-value first:
#   1. int8 serving probe, speed side (VERDICT r4 task 3) — no
#      checkpoint needed, first chip minutes;
#   2. oid_joint_s7 (25 ep) — second seed for the spread table AND the
#      round's only living joint checkpoint (s42's best died with the
#      host; its 0.166 number + per-image report + overlays are
#      recorded in ACCURACY.md / logs_r5);
#   3. int8 mAP drift on the s7 best (task 3 accuracy side);
#   4. joint->real-photo finetune from the s7 best (north-star stretch:
#      round-3's winning recipe warm-started from a joint model);
#   5. RGB-only ablation (depth delta) and seed 1234 (spread);
#   6. bench.py so the headline artifact exists before any tail work;
#   7. tail: the clean-key temporal chain (task 4) — consumes whatever
#      chip time remains, sentinel-gated per step.
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

python tools/oid_hands_labels.py 2>&1 | tee logs_r5/datasets.log
python tools/make_oid_joint.py   2>&1 | tee -a logs_r5/datasets.log

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

# ---- 1. int8 speed probe (no checkpoint needed) ----
step int8_bench 2400 \
  python scripts/bench_int8_serving.py

# ---- 2. seed 7: spread point + the round's living checkpoint ----
step oid_joint_s7 7200 \
  env EPOCHS=25 EXP_DIR=output/oid_joint_s7/ \
  bash configs/training/OID_Joint.sh --seed 7 --auto_resume
step oid_joint_s7_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best

# ---- 3. int8 drift on the s7 best (task 3 accuracy side) ----
step int8_drift_oid 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s7/best --int8

# ---- 4. north-star stretch: joint -> real-photo finetune ----
step oid_finetune2 5400 \
  env EPOCHS=200 EXP_DIR=output/oid_finetune2/ \
  bash configs/training/OID_LateFusion.sh --resume output/oid_joint_s7/best \
    --lr 5e-5 --strong_aug --eval_every 10 --auto_resume
step oid_finetune2_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_finetune2/best

# ---- 5. RGB-only ablation + third seed ----
step oid_joint_baseline 6000 \
  env EPOCHS=25 FUSION=Baseline USE_DEPTH=off EXP_DIR=output/oid_joint_baseline/ \
  bash configs/training/OID_Joint.sh --auto_resume
step oid_joint_baseline_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_baseline/best \
    --fusion_type Baseline
step oid_joint_s1234 6000 \
  env EPOCHS=25 EXP_DIR=output/oid_joint_s1234/ \
  bash configs/training/OID_Joint.sh --seed 1234 --auto_resume
step oid_joint_s1234_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_s1234/best

# ---- 6. headline bench before any tail work ----
step bench_final 2400 \
  python bench.py

echo QUEUE_R5C_CORE_DONE

# ---- 7. tail: clean-key temporal chain (task 4), time permitting ----
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

echo QUEUE_R5C_DONE
