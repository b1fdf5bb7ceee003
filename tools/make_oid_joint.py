"""Build the joint synth+OID training set (``datasets/oid_joint``).

The OID sample has only 20 train images (53 boxes over 27 photos,
``tools/oid_hands_labels.py``) — too few to train a 40M-param detector
from scratch without catastrophic overfitting.  This tool merges the
committed synthetic RGB-D set (``datasets/synth_rgbd``, 240 labeled
hand-blob frames) with the real OID train split into one COCO layout so
a single run sees both domains: the synthetic frames keep the
localization machinery trained while the real photos teach real-hand
appearance.  The real images are oversampled by symlinking each one
``--repeat`` times under distinct file names (the loader resolves
``file_name`` relative to ``coco/images`` and applies the reference's
``images -> depth_pred`` substitution, ``dfvod_tpu/data/dataset.py:47``,
mirroring ``/root/reference/datasets/torchvision_datasets/coco.py:75``),
so duplicate entries are just extra json records pointing at the same
bytes on disk.

Validation is the untouched OID val split — the north-star metric
(BASELINE.json: mAP@0.5 on the OID sample) is always scored on real
photos only.

Usage: python tools/make_oid_joint.py [--repeat 8] [--out datasets/oid_joint]
"""
from __future__ import annotations

import argparse
import json
import os


def _load(path):
    with open(path) as f:
        return json.load(f)


def _symlink(src, dst):
    if os.path.lexists(dst):
        os.remove(dst)
    os.symlink(os.path.relpath(src, os.path.dirname(dst)), dst)


def build(repo, out_dir, repeat):
    synth = os.path.join(repo, "datasets", "synth_rgbd", "coco")
    oid = os.path.join(repo, "datasets", "oid_hands", "coco")
    out = os.path.join(out_dir, "coco")
    for sub in ("images", "depth_pred", "annotations"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    synth_train = _load(os.path.join(synth, "annotations", "train.json"))
    oid_train = _load(os.path.join(oid, "annotations", "train.json"))
    oid_val = _load(os.path.join(oid, "annotations", "val.json"))

    images, annotations = [], []
    next_img, next_ann = 1, 1

    def add(img, anns, src_root, fname_out):
        nonlocal next_img, next_ann
        for sub in ("images", "depth_pred"):
            _symlink(os.path.join(src_root, sub, img["file_name"]),
                     os.path.join(out, sub, fname_out))
        rec = dict(img)
        rec["id"] = next_img
        rec["file_name"] = fname_out
        # joint training is single-frame; drop video linkage so the
        # vid_single path treats every record as a still image
        rec["video_id"] = -1
        rec["frame_id"] = 0
        images.append(rec)
        for a in anns:
            ar = dict(a)
            ar["id"] = next_ann
            ar["image_id"] = next_img
            annotations.append(ar)
            next_ann += 1
        next_img += 1

    by_img_s = {}
    for a in synth_train["annotations"]:
        by_img_s.setdefault(a["image_id"], []).append(a)
    for img in synth_train["images"]:
        add(img, by_img_s.get(img["id"], []), synth, "syn_" + img["file_name"])

    by_img_o = {}
    for a in oid_train["annotations"]:
        by_img_o.setdefault(a["image_id"], []).append(a)
    for rep in range(repeat):
        for img in oid_train["images"]:
            add(img, by_img_o.get(img["id"], []), oid,
                f"oid{rep}_" + img["file_name"])

    cats = oid_train["categories"]
    train = {"images": images, "annotations": annotations,
             "categories": cats, "videos": []}
    with open(os.path.join(out, "annotations", "train.json"), "w") as f:
        json.dump(train, f)

    # val: real OID photos only, ids untouched
    for img in oid_val["images"]:
        for sub in ("images", "depth_pred"):
            _symlink(os.path.join(oid, sub, img["file_name"]),
                     os.path.join(out, sub, img["file_name"]))
    with open(os.path.join(out, "annotations", "val.json"), "w") as f:
        json.dump(oid_val, f)

    n_oid = repeat * len(oid_train["images"])
    print(f"oid_joint: {len(images)} train records "
          f"({len(synth_train['images'])} synth + {n_oid} OID x{repeat}), "
          f"{len(annotations)} annotations, val = {len(oid_val['images'])} "
          f"real OID images")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=8,
                    help="oversampling factor for the 20 real OID images")
    ap.add_argument("--out", default="datasets/oid_joint")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build(repo, os.path.join(repo, args.out), args.repeat)


if __name__ == "__main__":
    main()
