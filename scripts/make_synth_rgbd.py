"""Generate the committed synthetic labeled RGB-D video detection set.

The reference ships 27 OID frames with NO annotations
(``sample_dataset/OID/{images,depth}``), so no real-data accuracy run is
possible against it. This generator produces a small but non-trivial
*labeled* RGB-D set in the exact directory layout the reference
hard-codes (``datasets/vid_single.py:166-175``): ``coco/images``,
``coco/depth_pred`` (the ``images -> depth_pred`` substitution path),
``coco/annotations/{train,val}.json`` with CocoVID video/frame fields.

Task design (deliberately depth-dependent):
- targets: "hand" blobs — an ellipse palm + 4 finger lobes, random skin-
  ish hue, 1-3 per image, moving smoothly across a 4-frame video clip;
- distractors: rectangles/circles drawn with the SAME color statistics,
  so RGB alone is ambiguous;
- depth: hands sit CLOSER than the background plane (bright in the
  depth map, with a radial falloff), distractors are painted flat AT
  the background depth — depth is the reliable cue;
- background: smooth low-frequency color noise + vignette, per-video.

Deterministic for a given seed; ~300 frames at 320x256 (a few MB).

Usage: python scripts/make_synth_rgbd.py [out_dir] [--seed 0]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

H, W = 256, 320
FRAMES_PER_VIDEO = 4


def smooth_noise(rng, h, w, scale=8, lo=0.0, hi=1.0):
    """Low-frequency noise: upsampled coarse grid."""
    coarse = rng.random((h // scale + 2, w // scale + 2))
    img = np.asarray(Image.fromarray(
        (coarse * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
        np.float32) / 255.0
    return lo + (hi - lo) * img


def hand_mask(rng, size):
    """A hand-ish blob in a (size x size) stamp: palm ellipse + 4 finger
    lobes along a random orientation. Returns bool (size, size)."""
    s = size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    cy = cx = s / 2.0
    ang = rng.uniform(0, 2 * np.pi)
    mask = (((yy - cy - s * 0.08) / (s * 0.28)) ** 2
            + ((xx - cx) / (s * 0.22)) ** 2) <= 1.0
    for i in range(4):
        fa = ang + (i - 1.5) * 0.35
        fy = cy - s * 0.18 + s * 0.32 * np.sin(fa - np.pi / 2)
        fx = cx + s * 0.32 * np.cos(fa - np.pi / 2)
        finger = (((yy - fy) / (s * 0.16)) ** 2
                  + ((xx - fx) / (s * 0.07)) ** 2) <= 1.0
        mask |= finger
    return mask


def paint(canvas, depth, stamp, top, left, color, depth_val):
    """Paste a bool stamp with color into canvas + radial depth falloff."""
    s = stamp.shape[0]
    y0, x0 = max(top, 0), max(left, 0)
    y1, x1 = min(top + s, H), min(left + s, W)
    if y1 <= y0 or x1 <= x0:
        return None
    sub = stamp[y0 - top:y1 - top, x0 - left:x1 - left]
    if not sub.any():
        return None
    region = canvas[y0:y1, x0:x1]
    region[sub] = color
    yy, xx = np.nonzero(sub)
    r = np.hypot(yy - sub.shape[0] / 2, xx - sub.shape[1] / 2) / (s / 2)
    depth[y0:y1, x0:x1][sub] = np.clip(
        depth_val * (1.0 - 0.25 * r), 0, 1) * 255
    ys, xs = np.nonzero(sub)
    return (x0 + xs.min(), y0 + ys.min(),
            xs.max() - xs.min() + 1, ys.max() - ys.min() + 1)


def motion_blur(rgb, rng, k=9):
    """Directional box blur: smears hands/distractors along a random
    direction (cheap separable approximation via shifted averages)."""
    ang = rng.uniform(0, np.pi)
    dy, dx = np.sin(ang), np.cos(ang)
    acc = np.zeros_like(rgb, np.float32)
    for i in range(-(k // 2), k // 2 + 1):
        sy, sx = int(round(i * dy)), int(round(i * dx))
        acc += np.roll(np.roll(rgb, sy, 0), sx, 1)
    return acc / k


def occlude(canvas, depth, rng, boxes, hard=False):
    """A foreground bar sweeping across each hand box: covers 40-75% of
    the box in RGB AND sits closer than the hand in depth, so neither
    modality can recover the object from this frame alone.

    ``hard`` (round 4): the round-3 split eval showed the single-frame
    model only loses 4.8 pts on the default degraded keys (0.786 vs
    0.834) — too little headroom to demonstrate the temporal win
    (VERDICT r3 weak #4/task 2). Hard mode occludes EVERY hand with an
    80-95% bar, leaving the degraded key frame near-uninformative while
    the clean +-1 neighbors still pin the object (hands drift <=6
    px/frame, well inside IoU-0.5 for the 40-90 px hands)."""
    for (x, y, w, h) in boxes:
        if not hard and rng.random() < 0.2:
            continue
        frac = rng.uniform(0.8, 0.95) if hard else rng.uniform(0.4, 0.75)
        if rng.random() < 0.5:  # vertical bar
            bw = max(int(w * frac), 4)
            bx = int(x + rng.uniform(0, max(w - bw, 1)))
            y0, y1 = max(int(y) - 8, 0), min(int(y + h) + 8, H)
            x0, x1 = max(bx, 0), min(bx + bw, W)
        else:                   # horizontal bar
            bh = max(int(h * frac), 4)
            by = int(y + rng.uniform(0, max(h - bh, 1)))
            x0, x1 = max(int(x) - 8, 0), min(int(x + w) + 8, W)
            y0, y1 = max(by, 0), min(by + bh, H)
        if y1 <= y0 or x1 <= x0:
            continue
        col = rng.random(3) * 0.5 + 0.25
        canvas[y0:y1, x0:x1] = col
        depth[y0:y1, x0:x1] = 250.0  # occluder is the CLOSEST surface


def make_video(rng, vid, img_id0, ann_id0, img_dir, depth_dir,
               degrade=False, hard=False):
    """One 4-frame clip. Returns (images, annotations).

    ``degrade`` (the ``synth_rgbd_hard`` variant, VERDICT r2 task 4):
    every EVEN frame is corrupted — motion blur over the whole frame
    plus a near-depth occluder bar across each hand — while odd frames
    stay clean. Boxes are kept from the clean geometry (the object is
    still there), so a temporal model can recover a degraded key frame
    from its clean neighbors while a single-frame model cannot: the
    property that makes TransVOD's reference frames informative
    (``README.md:22-28`` thesis claim)."""
    base_col = rng.random(3) * 0.4 + 0.1
    n_hands = rng.integers(1, 4)
    n_dis = rng.integers(0, 4)

    def rand_obj(size_lo, size_hi):
        size = int(rng.integers(size_lo, size_hi))
        pos = np.array([rng.integers(-size // 4, H - size * 3 // 4),
                        rng.integers(-size // 4, W - size * 3 // 4)],
                       np.float32)
        vel = rng.uniform(-6, 6, 2)
        # skin-ish hue for everything: RGB alone is ambiguous
        col = (np.array([0.75, 0.55, 0.45])
               + rng.uniform(-0.2, 0.2, 3)).clip(0, 1)
        return size, pos, vel, col

    hands = [(hand_mask(rng, int(s)), s, p, v, c) for s, p, v, c in
             [rand_obj(40, 90) for _ in range(n_hands)]]
    dists = [rand_obj(30, 70) for _ in range(n_dis)]
    dist_kind = [int(rng.integers(0, 2)) for _ in range(n_dis)]

    images, annotations = [], []
    img_id, ann_id = img_id0, ann_id0
    for f in range(FRAMES_PER_VIDEO):
        canvas = np.stack([smooth_noise(rng, H, W, 16, c * 0.6, c * 1.3)
                           for c in base_col], -1).clip(0, 1)
        depth = (smooth_noise(rng, H, W, 32, 0.15, 0.35) * 255)
        # distractors first (UNDER hands), flat at background depth
        for (size, pos, vel, col), kind in zip(dists, dist_kind):
            t, le = int(pos[0] + f * vel[0]), int(pos[1] + f * vel[1])
            yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
            if kind == 0:
                stamp = np.ones((size, size), bool)
            else:
                stamp = ((yy - size / 2) ** 2
                         + (xx - size / 2) ** 2) <= (size / 2) ** 2
            y0, x0 = max(t, 0), max(le, 0)
            y1, x1 = min(t + size, H), min(le + size, W)
            if y1 <= y0 or x1 <= x0:
                continue
            sub = stamp[y0 - t:y1 - t, x0 - le:x1 - le]
            canvas[y0:y1, x0:x1][sub] = col
            # depth untouched: distractor sits AT the background plane

        frame_anns = []
        erase_frame = degrade == "erase" and f % 2 == 0
        alpha_frame = degrade == "alpha" and f % 2 == 0
        for stamp, size, pos, vel, col in hands:
            t, le = int(pos[0] + f * vel[0]), int(pos[1] + f * vel[1])
            near = 0.6 + 0.35 * (size - 40) / 50.0
            if alpha_frame:
                # partial-evidence degrade (round 5, VERDICT r4 task 5):
                # the hand is alpha-blended at 15-30% contrast in RGB and
                # equally attenuated in depth on even frames — weak but
                # NONZERO single-frame evidence, and no occluder object
                # to leak the box. This fills the measured gap between
                # the bar-occluder sets (single-frame 0.842 — the bar IS
                # the evidence) and full erasure (0.004 — physics floor):
                # the regime where temporal aggregation over clean
                # neighbors has both headroom and a recoverable key.
                c2, d2 = np.array(canvas), np.array(depth)
                box = paint(c2, d2, stamp, t, le, col, near)
                a = rng.uniform(0.15, 0.30)
                canvas[:] = (1.0 - a) * canvas + a * c2
                depth[:] = (1.0 - a) * depth + a * d2
            elif erase_frame:
                # full occlusion: the hand is NOT rendered (RGB or depth)
                # on even frames, but its clean-geometry box is kept —
                # zero single-frame signal, full +-1-neighbor signal.
                # (The bar-occluder variants leak: the bar is placed
                # over the box, so a single-frame model learns to box
                # the occluder — measured 0.842 degraded-keys mAP@0.5,
                # logs_r4/hard2_split_single.log.)
                box = paint(np.array(canvas), np.array(depth), stamp,
                            t, le, col, near)  # box from throwaway copies
            else:
                box = paint(canvas, depth, stamp, t, le, col, near)
            if box is not None and box[2] >= 6 and box[3] >= 6:
                frame_anns.append(box)

        if degrade is True and f % 2 == 0:
            occlude(canvas, depth, rng, frame_anns, hard=hard)
            canvas = motion_blur(canvas, rng, k=15 if hard else 9)
        noise = rng.normal(0, 0.02, canvas.shape)
        rgb = ((canvas + noise).clip(0, 1) * 255).astype(np.uint8)
        name = f"v{vid:03d}_f{f}.jpg"
        Image.fromarray(rgb).save(img_dir / name, quality=88)
        # the loader substitutes images->depth_pred keeping the name
        # (``torchvision_datasets/coco.py:75-105`` semantics)
        Image.fromarray(depth.astype(np.uint8)).save(depth_dir / name,
                                                     quality=92)

        # file_name is relative to the coco/images img_folder root the
        # CLI passes (``data/dataset.py::build_dataset``)
        images.append({"id": img_id, "file_name": name,
                       "width": W, "height": H, "video_id": vid,
                       "frame_id": f})
        for (x, y, w, h) in frame_anns:
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [int(x), int(y), int(w), int(h)],
                "area": int(w) * int(h), "iscrowd": 0, "instance_id": 0,
                "segmentation": [[int(x), int(y), int(x + w), int(y),
                                  int(x + w), int(y + h),
                                  int(x), int(y + h)]]})
            ann_id += 1
        img_id += 1
    return images, annotations


def main(out_root, seed=0, n_train_videos=60, n_val_videos=15,
         degrade=False, hard=False):
    from pathlib import Path
    root = Path(out_root) / "coco"
    img_dir = root / "images"
    depth_dir = root / "depth_pred"
    ann_dir = root / "annotations"
    for d in (img_dir, depth_dir, ann_dir):
        d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    img_id, ann_id, vid = 1, 1, 1
    for split, n_videos in (("train", n_train_videos),
                            ("val", n_val_videos)):
        images, annotations, videos = [], [], []
        for _ in range(n_videos):
            videos.append({"id": vid, "name": f"v{vid:03d}"})
            imgs, anns = make_video(rng, vid, img_id, ann_id,
                                    img_dir, depth_dir, degrade=degrade,
                                    hard=hard)
            images += imgs
            annotations += anns
            img_id += len(imgs)
            ann_id += len(anns)
            vid += 1
        ds = {"images": images, "annotations": annotations,
              "videos": videos,
              "categories": [{"id": 1, "name": "Hand"},
                             {"id": 2, "name": "Unused"}]}
        (ann_dir / f"{split}.json").write_text(json.dumps(ds))
        print(f"{split}: {len(images)} images, {len(annotations)} boxes")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="datasets/synth_rgbd")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_videos", type=int, default=60)
    p.add_argument("--val_videos", type=int, default=15)
    p.add_argument("--erase", action="store_true",
                   help="degrade variant without the occluder leak: even "
                        "frames simply do not render the hands (RGB and "
                        "depth both background); boxes kept from clean "
                        "geometry. Single-frame mAP on degraded keys has "
                        "no signal at all; temporal models recover from "
                        "the clean odd neighbors (synth_rgbd_erase)")
    p.add_argument("--alpha_erase", action="store_true",
                   help="partial-evidence degrade (round 5): even frames "
                        "alpha-blend the hands at 15-30% contrast in RGB "
                        "and depth — weak-but-nonzero single-frame "
                        "evidence, no occluder to leak "
                        "(synth_rgbd_alpha)")
    p.add_argument("--degrade", action="store_true",
                   help="corrupt even frames (motion blur + near-depth "
                        "occluders); the synth_rgbd_hard variant where "
                        "temporal aggregation has signal to recover")
    p.add_argument("--hard", action="store_true",
                   help="with --degrade: occlude EVERY hand 80-95% and "
                        "double the blur so degraded key frames are "
                        "near-uninformative (synth_rgbd_hard2 — the "
                        "headroom the temporal-win experiment needs)")
    a = p.parse_args()
    mode = ("erase" if a.erase else
            "alpha" if a.alpha_erase else a.degrade)
    main(a.out, a.seed, a.train_videos, a.val_videos,
         degrade=mode, hard=a.hard)
