#!/usr/bin/env bash
# North-star run, joint-training variant (round 3): train LateFusion on
# datasets/oid_joint = committed synthetic RGB-D frames + the 20
# hand-labeled real OID train photos oversampled x8
# (tools/make_oid_joint.py), validating on the 7 real OID val photos.
# Rationale: 20 real images cannot train a 40M-param detector from
# scratch (no pretrained weights exist offline); the synthetic frames
# carry the localization machinery while the real photos carry
# real-hand appearance. ACCURACY.md records the runs.
set -x
set -o pipefail
EXP_DIR=${EXP_DIR:-output/oid_joint/}
COCO_PATH=${COCO_PATH:-datasets/oid_joint}
# USE_DEPTH=off -> RGB-only ablation (explicit, replacing the fragile
# set-but-empty ${USE_DEPTH-...} contract flagged in ADVICE r3)
if [ "${USE_DEPTH:-on}" = "off" ]; then
  DEPTH_FLAG=""
else
  DEPTH_FLAG="--use_depth"
fi
mkdir -p ${EXP_DIR}
python -u -m dfvod_tpu.cli.main \
    --backbone resnet50 \
    --epochs ${EPOCHS:-60} \
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
    ${DEPTH_FLAG} \
    --fusion_type ${FUSION:-LateFusion} \
    --dformer_backbone \
    --train_dtype bfloat16 \
    --device_preprocess \
    --train_short_sides 448 \
    --eval_short_side 448 \
    --max_size 800 \
    --strong_aug \
    --eval_every ${EVAL_EVERY:-5} \
    "$@" | tee -a ${EXP_DIR}/train_output.txt
