"""Hand-labeled COCO annotations for the reference's OID sample images.

The reference ships 27 RGB images + paired monocular depth maps under
``sample_dataset/OID/{images,depth}`` but **no annotation json**
(SURVEY.md §2.4 "Sample data"), so its north-star "mAP on the OID
sample" was unmeasurable. This file commits hand-drawn `Hand` bounding
boxes for all 27 images (53 instances, labeled by the rebuild authors
with an overlay/crop verification pass) and materializes the repo's
standard RGB-D detection layout:

    datasets/oid_hands/coco/
        images/      -> symlinks into <oid_root>/images
        depth_pred/  -> symlinks into <oid_root>/depth
        annotations/ train.json + val.json (20 / 7 image split)

Label conventions: one box per visible hand; tightly clasped /
interlocked hand pairs get a single box (they are not separable at
IoU-0.5 granularity); depicted hands (statues, photos-in-photos,
x-rays) are labeled like real ones, matching Open Images "Human hand"
semantics. Categories mirror ``datasets/synth_rgbd`` (`Hand` = id 1,
the reference's hand-class channel — ``segmentation.py:196-230``).

Usage:
    python tools/oid_hands_labels.py [--oid_root /root/reference/sample_dataset/OID]
"""
from __future__ import annotations

import argparse
import json
import os

# (width, height) per image, read once from the shipped files.
SIZES = {
    "0000b7e1500c94d7.jpg": (773, 1024),
    "0000b86e2fd18333.jpg": (1024, 691),
    "0000f509689e349c.jpg": (1024, 683),
    "0000f53faa4d14c3.jpg": (1024, 683),
    "0000fc29545be065.jpg": (683, 1024),
    "000a98aa78afeb18.jpg": (691, 1024),
    "000a99f66168fece.jpg": (1024, 768),
    "000aabd8888cfde7.jpg": (1024, 768),
    "000aced46074103a.jpg": (1024, 732),
    "000ad0ecfb21ee63.jpg": (1024, 687),
    "000afe7726e121ea.jpg": (1024, 683),
    "000b21663becc68e.jpg": (885, 768),
    "000b5b8157441840.jpg": (768, 1024),
    "000b9007a01f7405.jpg": (683, 1024),
    "000b9b00d7aef8f5.jpg": (1024, 440),
    "000ba28d70b1a999.jpg": (683, 1024),
    "000bb846e2629e83.jpg": (575, 1024),
    "000bc5ad4cc3ae73.jpg": (1024, 683),
    "000be572efea5716.jpg": (1024, 683),
    "000c052bb4b882c4.jpg": (1024, 683),
    "000c0d0c3585e157.jpg": (1024, 683),
    "000c0d3fefe62686.jpg": (1024, 768),
    "000c26b44a7b6a22.jpg": (1024, 680),
    "000c2733a31e966a.jpg": (1024, 681),
    "000c485289e9ee41.jpg": (1024, 1024),
    "000c929962080df0.jpg": (1024, 768),
    "000c9b15cd1dcd95.jpg": (1024, 768),
}

# Hand boxes in original-pixel xyxy.
BOXES = {
    "0000b7e1500c94d7.jpg": [[292, 88, 352, 126], [435, 255, 485, 325],
                             [340, 456, 415, 505]],
    "0000b86e2fd18333.jpg": [[287, 425, 422, 585], [560, 522, 658, 615]],
    "0000f509689e349c.jpg": [[113, 328, 369, 676], [635, 250, 922, 649]],
    "0000f53faa4d14c3.jpg": [[0, 191, 460, 683], [451, 250, 1024, 683],
                             [467, 582, 640, 683]],
    "0000fc29545be065.jpg": [[315, 535, 415, 675]],
    "000a98aa78afeb18.jpg": [[0, 665, 140, 835]],
    "000a99f66168fece.jpg": [[174, 492, 297, 730]],
    "000aabd8888cfde7.jpg": [[615, 345, 700, 458], [840, 426, 996, 515]],
    "000aced46074103a.jpg": [[523, 340, 562, 365], [580, 400, 645, 425],
                             [317, 227, 379, 278], [243, 478, 302, 532],
                             [243, 403, 280, 437], [732, 483, 809, 564]],
    "000ad0ecfb21ee63.jpg": [[353, 488, 430, 584], [860, 512, 950, 600]],
    "000afe7726e121ea.jpg": [[333, 161, 394, 225]],
    "000b21663becc68e.jpg": [[314, 442, 416, 576]],
    "000b5b8157441840.jpg": [[70, 100, 205, 205], [323, 343, 403, 425]],
    "000b9007a01f7405.jpg": [[109, 56, 266, 210]],
    "000b9b00d7aef8f5.jpg": [[60, 165, 120, 232], [383, 33, 490, 165],
                             [380, 197, 450, 252], [690, 140, 780, 225],
                             [870, 92, 952, 172]],
    "000ba28d70b1a999.jpg": [[61, 240, 314, 532], [198, 164, 567, 614]],
    "000bb846e2629e83.jpg": [[260, 388, 338, 462], [118, 645, 215, 718]],
    "000bc5ad4cc3ae73.jpg": [[410, 342, 543, 451], [474, 250, 614, 318]],
    "000be572efea5716.jpg": [[635, 96, 1024, 533]],
    "000c052bb4b882c4.jpg": [[251, 236, 323, 386], [645, 307, 727, 393]],
    "000c0d0c3585e157.jpg": [[363, 430, 425, 526]],
    "000c0d3fefe62686.jpg": [[570, 512, 612, 566]],
    "000c26b44a7b6a22.jpg": [[399, 75, 604, 245], [0, 218, 80, 410]],
    "000c2733a31e966a.jpg": [[502, 177, 655, 354], [445, 449, 538, 606]],
    "000c485289e9ee41.jpg": [[160, 90, 730, 560]],
    "000c929962080df0.jpg": [[97, 349, 230, 672]],
    "000c9b15cd1dcd95.jpg": [[645, 376, 727, 461], [320, 522, 420, 714],
                             [461, 515, 573, 733]],
}

VAL = [
    "0000b86e2fd18333.jpg",
    "0000f53faa4d14c3.jpg",
    "000b9007a01f7405.jpg",
    "000ba28d70b1a999.jpg",
    "000bc5ad4cc3ae73.jpg",
    "000c052bb4b882c4.jpg",
    "000c9b15cd1dcd95.jpg",
]

CATEGORIES = [{"id": 1, "name": "Hand"}, {"id": 2, "name": "Unused"}]


def _coco(names, first_img_id, first_ann_id):
    images, anns = [], []
    img_id, ann_id = first_img_id, first_ann_id
    for name in names:
        w, h = SIZES[name]
        images.append({"id": img_id, "file_name": name, "width": w,
                       "height": h, "video_id": -1, "frame_id": 0})
        for x0, y0, x1, y1 in BOXES[name]:
            x0, y0 = max(0, x0), max(0, y0)
            x1, y1 = min(w, x1), min(h, y1)
            bw, bh = x1 - x0, y1 - y0
            anns.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
                "instance_id": ann_id,
                "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
            })
            ann_id += 1
        img_id += 1
    return {"images": images, "annotations": anns, "videos": [],
            "categories": CATEGORIES}


def build(oid_root: str, out_root: str = "datasets/oid_hands"):
    coco_dir = os.path.join(out_root, "coco")
    ann_dir = os.path.join(coco_dir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    for sub, src in (("images", "images"), ("depth_pred", "depth")):
        dst_dir = os.path.join(coco_dir, sub)
        os.makedirs(dst_dir, exist_ok=True)
        for name in SIZES:
            dst = os.path.join(dst_dir, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(oid_root, src, name), dst)
    train = sorted(n for n in SIZES if n not in VAL)
    val = sorted(VAL)
    with open(os.path.join(ann_dir, "train.json"), "w") as f:
        json.dump(_coco(train, 1, 1), f)
    with open(os.path.join(ann_dir, "val.json"), "w") as f:
        json.dump(_coco(val, 1001, 1001), f)
    n_tr = sum(len(BOXES[n]) for n in train)
    n_va = sum(len(BOXES[n]) for n in val)
    print(f"oid_hands: {len(train)} train imgs / {n_tr} boxes, "
          f"{len(val)} val imgs / {n_va} boxes -> {coco_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser("oid_hands_labels")
    p.add_argument("--oid_root",
                   default="/root/reference/sample_dataset/OID")
    p.add_argument("--out_root", default="datasets/oid_hands")
    a = p.parse_args()
    build(a.oid_root, a.out_root)
