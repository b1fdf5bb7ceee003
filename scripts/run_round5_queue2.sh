#!/bin/bash
# Round-5 queue B — runs AFTER run_round5_queue.sh (the OID chain).
# Ordered by verdict priority so a wall-clock cut costs the least:
#   1. int8 serving probe (VERDICT r4 task 3): micro + in-model speed,
#      then mAP drift on the OID checkpoint — the first genuinely new
#      perf axis after four flat serving rounds;
#   2. temporal clean-key gap (task 4): stage-2 TransVOD++ with the
#      trunk UNFROZEN (FREEZE=off -> the reference's coco_pretrain
#      train-everything path; main_multi.py:380-386 is only the freeze
#      branch) on clean synth_rgbd — target: video within ~5 pts of
#      single-frame on clean keys;
#   3. partial-evidence temporal design (task 5): synth_rgbd_alpha
#      (hands alpha-blended 15-30% on even frames, no occluder leak),
#      stage 1 + unfrozen stage 2 + split evals — the middle rung of
#      ACCURACY.md's three-design ladder;
#   4. final bench.py.
set -x
set -o pipefail
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r5 output .sentinels

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

# ---- 1. int8 probe: speed first (also a fast go/no-go on whether this
# toolchain lowers int8 conv/dot to the MXU at all), then OID drift ----
step int8_bench 3000 \
  python scripts/bench_int8_serving.py

step int8_drift_oid 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint/best --int8


# ---- 2. clean-key gap: unfrozen stage 2 on clean synth_rgbd ----
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

step int8_drift_synth 1500 \
  python scripts/eval_split_report.py \
    --resume output/synth_latefusion/best \
    --coco_path datasets/synth_rgbd --int8

# ---- 3. partial-evidence (alpha) chain ----
python scripts/make_synth_rgbd.py datasets/synth_rgbd_alpha --alpha_erase \
  2>&1 | tee logs_r5/gen_alpha.log

step alpha_stage1 4800 \
  env EPOCHS=25 COCO_PATH=datasets/synth_rgbd_alpha \
  EXP_DIR=output/alpha_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 5 --auto_resume

step alpha_split_single 1500 \
  python scripts/eval_split_report.py \
    --resume output/alpha_latefusion/best \
    --coco_path datasets/synth_rgbd_alpha

step alpha_stage2_unfrozen 6000 \
  env STAGE=video FREEZE=off EPOCHS=30 COCO_PATH=datasets/synth_rgbd_alpha \
  EXP_DIR=output/alpha_transvod_pp/ \
  SPATIAL_WEIGHTS=output/alpha_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 3 --auto_resume

step alpha_split_video 1500 \
  python scripts/eval_split_report.py \
    --resume output/alpha_transvod_pp/best \
    --coco_path datasets/synth_rgbd_alpha \
    --temporal_mode transvod_pp --num_ref_frames 2

# ---- 4. final bench BEFORE the stretch goal so the headline
# artifact exists even if the round ends mid-finetune ----
step bench_final 3000 \
  python bench.py

# ---- 5. stretch (drop-if-no-time): joint->real-photo finetune ----
# north-star stretch: fine-tune the joint model on the 20 real
# photos (round-3's winning recipe, warm-started from the joint best —
# strictly more real-photo exposure than round-3's synth-only pretrain,
# whose peak 0.217 came from the same 400-epoch noisy plateau) ----
step oid_finetune2 5400 \
  env EPOCHS=200 EXP_DIR=output/oid_finetune2/ \
  bash configs/training/OID_LateFusion.sh --resume output/oid_joint/best \
    --lr 5e-5 --strong_aug --eval_every 10 --auto_resume

step oid_finetune2_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_finetune2/best

echo QUEUE_R5B_DONE
