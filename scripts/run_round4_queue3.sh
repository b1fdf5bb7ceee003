#!/bin/bash
# Round-4 queue part 2 — full-occlusion (erase) temporal chain.
# Launch only if the synth_rgbd_hard (default-degrade) chain cannot
# demonstrate video >= single on degraded keys (VERDICT r3 task 2 says:
# strengthen --degrade and re-run, and say so explicitly either way).
# Uses datasets/synth_rgbd_erase (--degrade --hard: every hand 80-95%
# occluded on even frames + doubled blur, clean odd frames).
#   stage 1: single-frame LateFusion on erase (40 ep)
#   stage 2: TransVOD++ from stage-1 weights, temporal heads only (60 ep)
#   split evals after each.
set -x
set -o pipefail
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r4 output .sentinels

step() { # step <name> <deadline_s> <cmd...>
  local name=$1 deadline=$2; shift 2
  if [ -f ".sentinels/$name" ]; then echo "skip $name (sentinel)"; return 0; fi
  if python scripts/supervise.py --stall 900 --deadline "$deadline" -- \
      "$@" 2>&1 | tee "logs_r4/$name.log"; then
    touch ".sentinels/$name"
  else
    echo "STEP FAILED: $name" | tee -a "logs_r4/$name.log"
    return 1
  fi
}

step erase_stage1 4200 \
  env EPOCHS=30 COCO_PATH=datasets/synth_rgbd_erase \
  EXP_DIR=output/erase_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 5 --auto_resume

step erase_split_single 1500 \
  python scripts/eval_split_report.py \
    --resume output/erase_latefusion/best \
    --coco_path datasets/synth_rgbd_erase

step erase_stage2 3600 \
  env STAGE=video EPOCHS=45 COCO_PATH=datasets/synth_rgbd_erase \
  EXP_DIR=output/erase_transvod_pp/ \
  SPATIAL_WEIGHTS=output/erase_latefusion/ \
  bash configs/training/SynthHard_Temporal.sh --eval_every 3 --auto_resume

step erase_split_video 1500 \
  python scripts/eval_split_report.py \
    --resume output/erase_transvod_pp/best \
    --coco_path datasets/synth_rgbd_erase \
    --temporal_mode transvod_pp --num_ref_frames 2

echo QUEUE_R4_PART2_DONE
