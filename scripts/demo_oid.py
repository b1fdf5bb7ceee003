"""Demo: run RGB-D inference on the reference's OID sample images
(``/root/reference/sample_dataset/OID`` — 27 RGB images + paired depth).

With no trained checkpoint available the detections are from random
weights (this demonstrates the full real-data path: paired RGB+depth
loading, depth min-max normalization, eval transform, jitted forward,
keep_prob thresholding, YOLO txt + overlay output). Pass --resume to use
a trained checkpoint (orbax dir or reference .pth).

  python scripts/demo_oid.py --out /tmp/oid_demo [--resume ckpt]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OID = "/root/reference/sample_dataset/OID"


def main():
    p = argparse.ArgumentParser("demo_oid")
    p.add_argument("--out", default="/tmp/oid_demo")
    p.add_argument("--resume", default="")
    p.add_argument("--num_images", type=int, default=4)
    p.add_argument("--keep_prob", type=float, default=0.0)
    a = p.parse_args()

    from dfvod_tpu.cli.inference import run_inference
    from dfvod_tpu.utils.config import Config, ModelConfig

    images = sorted(os.listdir(os.path.join(OID, "images")))[
        :a.num_images]
    os.makedirs(a.out, exist_ok=True)
    # stage the subset so run_inference's folder mode sees only N files
    stage = os.path.join(a.out, "_stage")
    os.makedirs(stage, exist_ok=True)
    for name in images:
        dst = os.path.join(stage, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(OID, "images", name), dst)

    cfg = Config(model=ModelConfig(use_depth=True,
                                   fusion_type="LateFusion",
                                   compute_dtype="bfloat16"))
    results = run_inference(
        cfg=cfg, img_folder=stage,
        depth_folder=os.path.join(OID, "depth"),
        output_dir=a.out, keep_prob=a.keep_prob,
        resume=a.resume, save_txt=True, save_img=True)
    kept = sum(len(r["probs"]) for r in results)
    print(f"ran {len(results)} RGB-D images -> {a.out} "
          f"({kept} detections kept at keep_prob={a.keep_prob})")


if __name__ == "__main__":
    main()
