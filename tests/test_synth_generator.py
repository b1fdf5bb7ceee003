"""Synthetic-set generator invariants (scripts/make_synth_rgbd.py).

The round-4 temporal experiments hinge on degrade-mode semantics:
- bar modes put a near-depth occluder over each hand (which leaks the
  box location — measured 0.842 degraded-key mAP, ACCURACY.md);
- erase mode must render NOTHING of the hand on even frames (RGB and
  depth both pure background) while keeping the clean-geometry boxes —
  the leak-free design. These tests pin that contract.
"""
import importlib.util
import json
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "make_synth_rgbd", os.path.join(REPO, "scripts", "make_synth_rgbd.py"))
gen = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gen)


def _build(tmp_path, **kw):
    out = tmp_path / "ds"
    gen.main(str(out), seed=3, n_train_videos=3, n_val_videos=2, **kw)
    root = out / "coco"
    ds = {s: json.loads((root / "annotations" / f"{s}.json").read_text())
          for s in ("train", "val")}
    return root, ds


class TestEraseMode:
    def test_even_frames_have_no_hand_signal(self, tmp_path):
        root, ds = _build(tmp_path, degrade="erase")
        by_id = {im["id"]: im for im in ds["train"]["images"]}
        checked_even = checked_odd = 0
        for im in ds["train"]["images"]:
            depth = np.asarray(Image.open(
                root / "depth_pred" / im["file_name"]).convert("L"),
                np.float32)
            anns = [a for a in ds["train"]["annotations"]
                    if a["image_id"] == im["id"]]
            if not anns:
                continue
            boxes = np.array([a["bbox"] for a in anns])
            # hands are painted bright (>=0.35*255 nominal * (1-falloff))
            # in depth; background tops out at 0.35*255 ~ 89 + jpeg noise
            peak = max(depth[int(y):int(y + h), int(x):int(x + w)].max()
                       for x, y, w, h in boxes)
            if im["frame_id"] % 2 == 0:
                assert peak < 110, (im["file_name"], peak)
                checked_even += 1
            else:
                assert peak > 120, (im["file_name"], peak)
                checked_odd += 1
        assert checked_even >= 3 and checked_odd >= 3

    def test_boxes_exist_on_both_parities(self, tmp_path):
        _, ds = _build(tmp_path, degrade="erase")
        by_id = {im["id"]: im for im in ds["train"]["images"]}
        parities = {by_id[a["image_id"]]["frame_id"] % 2
                    for a in ds["train"]["annotations"]}
        assert parities == {0, 1}

    def test_default_degrade_keeps_occluder_depth(self, tmp_path):
        root, ds = _build(tmp_path, degrade=True, hard=True)
        # hard bars paint depth 250 somewhere inside each even-frame box
        hit = 0
        for im in ds["train"]["images"]:
            if im["frame_id"] % 2 != 0:
                continue
            depth = np.asarray(Image.open(
                root / "depth_pred" / im["file_name"]).convert("L"))
            if depth.max() > 230:
                hit += 1
        assert hit >= 2


class TestAlphaMode:
    """Partial-evidence alpha degrade (round 5): even frames carry the
    hands at 15-30% contrast — strictly between background (erase) and
    full rendering (clean)."""

    def test_even_frames_attenuated_not_erased(self, tmp_path):
        root, ds = _build(tmp_path, degrade="alpha")
        even_peaks, odd_peaks = [], []
        for im in ds["train"]["images"]:
            depth = np.asarray(Image.open(
                root / "depth_pred" / im["file_name"]).convert("L"),
                np.float32)
            anns = [a for a in ds["train"]["annotations"]
                    if a["image_id"] == im["id"]]
            if not anns:
                continue
            boxes = np.array([a["bbox"] for a in anns])
            peak = max(depth[int(y):int(y + h), int(x):int(x + w)].max()
                       for x, y, w, h in boxes)
            (even_peaks if im["frame_id"] % 2 == 0 else
             odd_peaks).append(peak)
        assert len(even_peaks) >= 3 and len(odd_peaks) >= 3
        # odd (clean) frames: full hand depth (>120, as in erase test);
        # even frames: visibly attenuated below clean but above the
        # erase-mode background ceiling — evidence present but weak
        assert min(odd_peaks) > 120
        assert max(even_peaks) < min(odd_peaks)
        assert np.mean(even_peaks) > 95  # not erased to background

    def test_boxes_on_both_parities(self, tmp_path):
        _, ds = _build(tmp_path, degrade="alpha")
        by_id = {im["id"]: im for im in ds["train"]["images"]}
        parities = {by_id[a["image_id"]]["frame_id"] % 2
                    for a in ds["train"]["annotations"]}
        assert parities == {0, 1}

    def test_no_occluder_leak(self, tmp_path):
        # alpha mode must add NO bright occluder bar (depth ~250) —
        # nothing in the frame may exceed the clean hand ceiling
        root, ds = _build(tmp_path, degrade="alpha")
        for im in ds["train"]["images"]:
            if im["frame_id"] % 2 != 0:
                continue
            depth = np.asarray(Image.open(
                root / "depth_pred" / im["file_name"]).convert("L"))
            assert depth.max() < 230, im["file_name"]
