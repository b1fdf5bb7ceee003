"""Native C++ preprocessing library tests — builds the .so via make and
checks parity against numpy references."""
import os

import numpy as np
import pytest

from dfvod_tpu.data import native
from dfvod_tpu.data.transforms import (
    DEPTH_MEAN,
    DEPTH_STD,
    RGB_MEAN,
    RGB_STD,
    Sample,
    normalize_and_pad,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library failed to build")


def numpy_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Half-pixel bilinear reference (align_corners=False, no antialias)."""
    sh, sw = src.shape[:2]
    ys = (np.arange(dh) + 0.5) * sh / dh - 0.5
    xs = (np.arange(dw) + 0.5) * sw / dw - 0.5
    y0 = np.floor(ys)
    x0 = np.floor(xs)
    fy, fx = ys - y0, xs - x0
    y0 = y0.astype(int)
    x0 = x0.astype(int)
    y0c, y1c = np.clip(y0, 0, sh - 1), np.clip(y0 + 1, 0, sh - 1)
    x0c, x1c = np.clip(x0, 0, sw - 1), np.clip(x0 + 1, 0, sw - 1)
    a = src.astype(np.float64)
    out = (a[y0c][:, x0c] * ((1 - fy)[:, None] * (1 - fx)[None])[..., None]
           + a[y0c][:, x1c] * ((1 - fy)[:, None] * fx[None])[..., None]
           + a[y1c][:, x0c] * (fy[:, None] * (1 - fx)[None])[..., None]
           + a[y1c][:, x1c] * (fy[:, None] * fx[None])[..., None])
    return out


class TestNative:
    def test_resize_matches_numpy_reference(self, rng):
        src = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
        got = native.resize_bilinear_u8(src, 20, 30)
        ref = numpy_bilinear(src, 20, 30)
        assert np.abs(got.astype(np.float64) - ref).max() <= 1.0  # rounding

    def test_resize_identity(self, rng):
        src = rng.integers(0, 255, (16, 24, 3)).astype(np.uint8)
        got = native.resize_bilinear_u8(src, 16, 24)
        np.testing.assert_array_equal(got, src)

    def test_fused_preprocess_matches_python(self, rng):
        rgb = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        depth = rng.integers(0, 255, (24, 32)).astype(np.uint8)
        mean = np.concatenate([RGB_MEAN, [DEPTH_MEAN]]).astype(np.float32)
        std = np.concatenate([RGB_STD, [DEPTH_STD]]).astype(np.float32)
        out, mask = native.preprocess_rgbd(rgb, depth, (24, 32), (32, 32),
                                           mean, std)
        assert out.shape == (32, 32, 4)
        ref_rgb = (rgb.astype(np.float32) / 255 - RGB_MEAN) / RGB_STD
        ref_d = (depth.astype(np.float32) / 255 - DEPTH_MEAN) / DEPTH_STD
        np.testing.assert_allclose(out[:24, :32, :3], ref_rgb, atol=1e-5)
        np.testing.assert_allclose(out[:24, :32, 3], ref_d, atol=1e-5)
        assert not mask[:24, :32].any()
        assert mask[24:].all()
        np.testing.assert_allclose(out[24:], 0.0)

    def test_normalize_depth_u16(self):
        d = np.array([[100, 300], [500, 100]], np.uint16)
        out = native.normalize_depth_u16(d)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[1, 0] == 255

    def test_transform_paths_agree(self, rng):
        """normalize_and_pad native vs python paths (no resize involved)."""
        s = Sample(rgb=rng.integers(0, 255, (20, 28, 3)).astype(np.uint8),
                   depth=rng.integers(0, 255, (20, 28)).astype(np.uint8),
                   boxes=np.array([[2., 2., 10., 12.]], np.float32),
                   labels=np.array([1]), orig_size=(20, 28))
        os.environ["DFVOD_NATIVE"] = "0"
        try:
            py = normalize_and_pad(s, (32, 32), True, 4)
        finally:
            os.environ["DFVOD_NATIVE"] = "1"
        nat = normalize_and_pad(s, (32, 32), True, 4)
        np.testing.assert_allclose(nat["image"], py["image"], atol=1e-5)
        np.testing.assert_array_equal(nat["mask"], py["mask"])
        np.testing.assert_allclose(nat["boxes"], py["boxes"])


def test_pack_rgbd_matches_numpy(rng):
    from dfvod_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    h, w = 37, 53
    rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    depth = rng.integers(0, 255, (h, w)).astype(np.uint8)
    out = np.zeros((48, 64, 4), np.uint8)
    ref = out.copy()
    native.pack_rgbd_u8(rgb, depth, out)
    ref[:h, :w, :3] = rgb
    ref[:h, :w, 3] = depth
    np.testing.assert_array_equal(out, ref)
