"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-world answer to "test multi-chip without a cluster"
(SURVEY.md §4): shardings and collectives compile and execute on the
virtual CPU mesh exactly as they would over ICI.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs;
# the config update still applies as long as no backend client exists yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# module-level slow tagging: e2e train loops, full-model torch parity,
# multihost subprocesses, Pallas interpret-mode kernels, overfit runs.
# ``pytest -m "not slow"`` is the fast tier (target < 3 min).
SLOW_MODULES = {
    "test_cli_e2e",
    "test_full_model_parity",
    "test_msda_pallas",
    "test_multihost",
    "test_overfit",
    "test_temporal",
    "test_torch_module_parity",
    "test_train_optim",
    "test_device_pipeline",
    "test_fused_bottleneck",
    "test_attribution",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def coco_dir(tmp_path):
    """Synthesized RGB-D COCO tree: images/ + depth_pred/ + json with two
    videos of 4 frames each (contiguous ids, like the reference data)."""
    import json

    from PIL import Image

    img_dir = tmp_path / "images"
    depth_dir = tmp_path / "depth_pred"
    img_dir.mkdir()
    depth_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations, videos = [], [], []
    ann_id = 1
    img_id = 1
    for vid in (1, 2):
        videos.append({"id": vid, "name": f"v{vid}"})
        for frame in range(4):
            name = f"v{vid}_f{frame}.jpg"
            h, w = 48, 64
            Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)
                            ).save(img_dir / name)
            Image.fromarray(rng.integers(0, 255, (h, w), np.uint8)
                            ).save(depth_dir / name.replace("jpg", "png"))
            # depth files keep the same name in our substitution scheme:
            Image.fromarray(rng.integers(0, 255, (h, w), np.uint8)
                            ).save(depth_dir / name)
            images.append({"id": img_id, "file_name": f"images/{name}",
                           "width": w, "height": h, "video_id": vid,
                           "frame_id": frame})
            annotations.append({"id": ann_id, "image_id": img_id,
                                "category_id": 1, "bbox": [8, 8, 16, 12],
                                "area": 16 * 12, "iscrowd": 0,
                                "instance_id": vid})
            ann_id += 1
            img_id += 1
    ds = {"images": images, "annotations": annotations, "videos": videos,
          "categories": [{"id": 1, "name": "Hand"}]}
    ann = tmp_path / "train.json"
    ann.write_text(json.dumps(ds))
    return tmp_path, str(ann)
