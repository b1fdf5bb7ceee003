#!/usr/bin/env bash
# dfvod_tpu training config — mirrors reference configs/training/TransVOD++.sh
set -x
EXP_DIR=output/transvod_pp_withdepth/
COCO_PATH=${COCO_PATH:-/data}
TRANSVOD_TEMPORAL_WEIGHTS=${TRANSVOD_TEMPORAL_WEIGHTS:-}
SPATIAL_WEIGHTS=${SPATIAL_WEIGHTS:-}
mkdir -p ${EXP_DIR}
python -u -m dfvod_tpu.cli.main_multi \
    --backbone resnet50 \
    --num_ref_frames 4 \
    --epochs 7 \
    --num_feature_levels 1 \
    --num_queries 300 \
    --dilation \
    --batch_size 1 \
    --with_box_refine \
    --dataset_file vid_multi_plusplus \
    --output_dir ${EXP_DIR} \
    --coco_path ${COCO_PATH} \
    --num_classes 3 \
    --dropout 0.2 \
    --lr 1e-4 \
    --weight_decay 2e-5 \
    --use_depth \
    --fusion_type LateFusion \
    --dformer_backbone \
    ${DFORMER_WEIGHTS:+--dformer_weights ${DFORMER_WEIGHTS}} \
    ${SPATIAL_WEIGHTS:+--spatial_weights ${SPATIAL_WEIGHTS}} \
    ${TRANSVOD_TEMPORAL_WEIGHTS:+--transvod_temporal_weights ${TRANSVOD_TEMPORAL_WEIGHTS}} \
    "$@" | tee -a ${EXP_DIR}/train_output.txt
