#!/usr/bin/env bash
# Real-photo accuracy run on the hand-labeled OID sample set
# (datasets/oid_hands — tools/oid_hands_labels.py commits Hand boxes for
# the reference's 27-image sample_dataset/OID, which ships no
# annotations). Same recipe as Synth_LateFusion.sh at higher input
# resolution (real hands are small in 1024px photos). ACCURACY.md
# records the runs.
set -x
EXP_DIR=${EXP_DIR:-output/oid_latefusion/}
COCO_PATH=${COCO_PATH:-datasets/oid_hands}
mkdir -p ${EXP_DIR}
python -u -m dfvod_tpu.cli.main \
    --backbone resnet50 \
    --epochs ${EPOCHS:-300} \
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
    --fusion_type ${FUSION:-LateFusion} \
    --dformer_backbone \
    --train_dtype bfloat16 \
    --device_preprocess \
    --train_short_sides 384 448 512 \
    --eval_short_side 448 \
    --max_size 800 \
    "$@" | tee -a ${EXP_DIR}/train_output.txt
