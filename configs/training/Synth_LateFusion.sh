#!/usr/bin/env bash
# Real-data accuracy run on the committed synthetic labeled RGB-D set
# (datasets/synth_rgbd, scripts/make_synth_rgbd.py): LateFusion + DFormer
# depth stem, bf16 mixed-precision training, on-device uint8 preprocess.
# Reports mAP@0.5 from the from-scratch COCO evaluator at the end
# (ACCURACY.md records the runs).
set -x
EXP_DIR=${EXP_DIR:-output/synth_latefusion/}
COCO_PATH=${COCO_PATH:-datasets/synth_rgbd}
mkdir -p ${EXP_DIR}
python -u -m dfvod_tpu.cli.main \
    --backbone resnet50 \
    --epochs ${EPOCHS:-30} \
    --num_feature_levels 1 \
    --num_queries 300 \
    --batch_size 8 \
    --dilation \
    --with_box_refine \
    --dataset_file vid_single \
    --output_dir ${EXP_DIR} \
    --coco_path ${COCO_PATH} \
    --num_classes 3 \
    --dropout 0.1 \
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
    "$@" | tee -a ${EXP_DIR}/train_output.txt
