"""Data subsystem — COCO/CocoVID parsing, paired RGB-D transforms,
static-shape batching, host loader with device prefetch.

Replaces the reference's L4 layer (``datasets/``, SURVEY.md §2.3) without
pycocotools (not available here): ``coco.py`` is a self-contained COCO
index and ``coco_eval.py`` a from-scratch numpy COCO bbox mAP evaluator
with pycocotools-matching semantics.
"""
from dfvod_tpu.data.coco import COCO, CocoVID  # noqa: F401
from dfvod_tpu.data.dataset import (  # noqa: F401
    CocoDetectionDataset,
    build_dataset,
)
from dfvod_tpu.data.loader import Loader  # noqa: F401
