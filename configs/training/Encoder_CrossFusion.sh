#!/usr/bin/env bash
# dfvod_tpu training config — mirrors the reference
# configs/training/Encoder_CrossFusion.sh flag set on the TPU CLI.
set -x
EXP_DIR=output/encoder_crossfusion/
COCO_PATH=${COCO_PATH:-/data}      # expects $COCO_PATH/coco/{images,annotations}
RESUME_PATH=${RESUME_PATH:-}
mkdir -p ${EXP_DIR}
python -u -m dfvod_tpu.cli.main \
    --backbone resnet50 \
    --epochs 20 \
    --num_feature_levels 1 \
    --num_queries 300 \
    --batch_size 6 \
    --dilation \
    --with_box_refine \
    --dataset_file vid_single \
    --output_dir ${EXP_DIR} \
    --coco_path ${COCO_PATH} \
    --num_classes 3 \
    --dropout 0.2 \
    --lr 1e-5 \
    --weight_decay 2e-5 \
    --use_depth \
    --fusion_type Encoder_CrossFusion \
    --dformer_backbone \
    ${DFORMER_WEIGHTS:+--dformer_weights ${DFORMER_WEIGHTS}} \
    --del_class_weights \
    --resume ${RESUME_PATH} \
    "$@" | tee -a ${EXP_DIR}/train_output.txt
