"""Photometric / crop clip-augmentation tests."""
import numpy as np

from dfvod_tpu.data.photometric import (
    MinIoURandomCrop,
    PhotometricDistortion,
    RandomBrightness,
    RandomContrast,
    RandomHue,
    RandomLightingNoise,
    RandomSaturation,
)
from dfvod_tpu.data.transforms import Sample


def frames(rng, n=2, h=40, w=60):
    return [Sample(rgb=rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
                   depth=rng.integers(0, 255, (h, w)).astype(np.uint8),
                   boxes=np.array([[10., 10., 30., 30.]], np.float32),
                   labels=np.array([1]), orig_size=(h, w))
            for _ in range(n)]


class TestMinIoUCrop:
    def test_boxes_stay_inside_crop(self, rng):
        op = MinIoURandomCrop()
        for seed in range(10):
            g = np.random.default_rng(seed)
            out = op(frames(rng), g)
            h, w = out[0].rgb.shape[:2]
            for f in out:
                assert f.rgb.shape[:2] == (h, w)
                assert f.depth.shape[:2] == (h, w)
                if len(f.boxes):
                    b = f.boxes
                    assert (b[:, 0] >= -1e-4).all() and \
                        (b[:, 2] <= w + 1e-4).all()
                    assert (b[:, 2] > b[:, 0]).all()

    def test_clip_consistent(self, rng):
        g = np.random.default_rng(7)
        out = MinIoURandomCrop()(frames(rng, n=3), g)
        shapes = {f.rgb.shape for f in out}
        assert len(shapes) == 1


class TestPhotometric:
    def test_contrast_scales(self, rng):
        g = np.random.default_rng(1)
        fs = frames(rng)
        out = RandomContrast()(fs, g)
        # depth untouched by photometric ops
        np.testing.assert_array_equal(out[0].depth, fs[0].depth)
        # boxes untouched
        np.testing.assert_array_equal(out[0].boxes, fs[0].boxes)

    def test_lighting_noise_permutes_channels(self, rng):
        fs = frames(rng, n=1)
        for seed in range(10):
            out = RandomLightingNoise()(fs, np.random.default_rng(seed))
            sums = sorted(out[0].rgb.astype(int).sum(axis=(0, 1)))
            ref = sorted(fs[0].rgb.astype(int).sum(axis=(0, 1)))
            assert sums == ref  # permutation preserves channel sums

    def test_full_stack_runs(self, rng):
        g = np.random.default_rng(3)
        out = PhotometricDistortion()(frames(rng), g)
        assert out[0].rgb.dtype == np.uint8
        assert out[0].rgb.shape == frames(rng)[0].rgb.shape

    def test_hue_saturation_preserve_shape(self, rng):
        g = np.random.default_rng(5)
        fs = frames(rng)
        out = RandomHue()(RandomSaturation()(fs, g), g)
        assert out[0].rgb.shape == fs[0].rgb.shape

    def test_brightness_shifts(self, rng):
        fs = frames(rng, n=1)
        shifted = False
        for seed in range(8):
            out = RandomBrightness(delta=50)(fs, np.random.default_rng(seed))
            if not np.array_equal(out[0].rgb, fs[0].rgb):
                shifted = True
        assert shifted
