#!/usr/bin/env bash
# Temporal-win experiment (VERDICT r2 task 4): on datasets/synth_rgbd_hard
# (scripts/make_synth_rgbd.py --degrade: even frames motion-blurred with
# near-depth occluders, odd frames clean) the single-frame model cannot
# recover degraded key frames but TransVOD/TransVOD++ can aggregate the
# clean neighbors — the property behind the reference thesis's
# TransVOD++ >= single-frame claim (README.md:22-28).
#
# Stage 1 (this script without STAGE=video): single-frame LateFusion.
# Stage 2 (STAGE=video): TransVOD++ from the stage-1 weights, temporal
# heads only (--fixed_pretrained_model), the reference's two-stage video
# recipe (main_multi.py:342-386).
set -x
COCO_PATH=${COCO_PATH:-datasets/synth_rgbd_hard}
if [ "${STAGE:-single}" = "video" ]; then
  EXP_DIR=${EXP_DIR:-output/synthhard_transvod_pp/}
  mkdir -p ${EXP_DIR}
  # FREEZE=off -> train the whole model in stage 2 (the reference's
  # coco_pretrain path, main_multi.py:380-386 is only the FREEZE branch).
  # Round-4 verdict weak #4: frozen-trunk temporal heads from scratch
  # plateau ~0.20 on clean keys; the unfrozen variant closes that gap.
  if [ "${FREEZE:-on}" = "off" ]; then
    FREEZE_FLAG=""
  else
    FREEZE_FLAG="--fixed_pretrained_model"
  fi
  python -u -m dfvod_tpu.cli.main_multi \
      --backbone resnet50 \
      --num_ref_frames ${NREF:-2} \
      --epochs ${EPOCHS:-12} \
      --num_feature_levels 1 \
      --num_queries 300 \
      --dilation \
      --batch_size ${BATCH:-4} \
      --with_box_refine \
      --dataset_file ${DATASET:-vid_multi_plusplus} \
      --output_dir ${EXP_DIR} \
      --coco_path ${COCO_PATH} \
      --num_classes 3 \
      --dropout 0.2 \
      --lr 1e-4 \
      --weight_decay 2e-5 \
      --use_depth \
      --fusion_type LateFusion \
      --dformer_backbone \
      --train_dtype bfloat16 \
      --device_preprocess \
      --train_short_sides 224 256 288 320 \
      --eval_short_side 256 \
      --max_size 512 \
      --spatial_weights ${SPATIAL_WEIGHTS:-output/synthhard_latefusion/} \
      ${FREEZE_FLAG} \
      "$@" | tee -a ${EXP_DIR}/train_output.txt
else
  EXP_DIR=${EXP_DIR:-output/synthhard_latefusion/}
  mkdir -p ${EXP_DIR}
  EPOCHS=${EPOCHS:-30} EXP_DIR=${EXP_DIR} COCO_PATH=${COCO_PATH} \
      bash "$(dirname "$0")/Synth_LateFusion.sh" "$@"
fi
