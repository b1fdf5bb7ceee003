"""On-device preprocessing pipeline tests: uint8 loader path + in-jit
normalization parity with the host path."""
import jax.numpy as jnp
import numpy as np

from dfvod_tpu.data.device_pipeline import device_normalize
from dfvod_tpu.data.transforms import Sample, normalize_and_pad, pad_u8


def sample(rng, h=20, w=28):
    return Sample(rgb=rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
                  depth=rng.integers(0, 255, (h, w)).astype(np.uint8),
                  boxes=np.array([[2., 2., 10., 12.]], np.float32),
                  labels=np.array([1]), orig_size=(h, w))


class TestDevicePipeline:
    def test_parity_with_host_path(self, rng):
        s = sample(rng)
        host = normalize_and_pad(s, (32, 32), True, 4)
        dev = pad_u8(s, (32, 32), True, 4)
        img, mask = device_normalize(jnp.asarray(dev["image"][None]),
                                     jnp.asarray(dev["size"][None]))
        np.testing.assert_allclose(np.asarray(img[0]), host["image"],
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(mask[0]), host["mask"])
        np.testing.assert_allclose(dev["boxes"], host["boxes"])
        np.testing.assert_array_equal(dev["valid"], host["valid"])

    def test_train_step_accepts_uint8(self, rng):
        """The jitted step normalizes in-graph (fuses into the model)."""
        import jax
        from dfvod_tpu.models import build_model
        from dfvod_tpu.train import create_train_state, make_train_step
        from dfvod_tpu.utils.config import Config, ModelConfig

        cfg = Config(model=ModelConfig(
            num_classes=3, num_queries=8, hidden_dim=32, nheads=4,
            enc_layers=1, dec_layers=1, dim_feedforward=64, dropout=0.0,
            num_feature_levels=1, fusion_type="Baseline",
            with_box_refine=True))
        model, criterion, _ = build_model(cfg)
        B, H, W, T = 2, 64, 64, 4
        batch = {
            "images": rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8),
            "sizes": np.array([[64, 64], [48, 56]], np.int64),
            "labels": np.ones((B, T), np.int32),
            "boxes": np.tile(np.array([.5, .5, .2, .2], np.float32),
                             (B, T, 1)),
            "valid": np.tile(np.arange(T) < 1, (B, 1)),
        }
        state, tx, _ = create_train_state(jax.random.PRNGKey(0), model,
                                          cfg, batch, 10)
        step = make_train_step(model, criterion, tx)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
