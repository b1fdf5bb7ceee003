"""Sine position embedding: rect fast path == general cumsum form."""
import jax.numpy as jnp
import numpy as np
import pytest

from dfvod_tpu.models.position_encoding import (
    sine_position_embedding,
    sine_position_embedding_rect,
)


@pytest.mark.parametrize("valid", [(7, 9), (7, 12), (12, 9), (12, 12),
                                   (1, 1)])
def test_rect_matches_general(valid):
    H, W = 12, 9
    vh, vw = min(valid[0], H), min(valid[1], W)
    not_mask = np.zeros((3, H, W), bool)
    not_mask[:, :vh, :vw] = True
    # one batch row fully valid to mix cases
    not_mask[1] = True
    a = np.asarray(sine_position_embedding(jnp.asarray(not_mask), 16))
    b = np.asarray(sine_position_embedding_rect(jnp.asarray(not_mask), 16))
    np.testing.assert_array_equal(a, b)


def test_rect_matches_general_production_shape():
    not_mask = np.zeros((2, 38, 50), bool)
    not_mask[0, :38, :50] = True
    not_mask[1, :30, :41] = True
    a = np.asarray(sine_position_embedding(jnp.asarray(not_mask)))
    b = np.asarray(sine_position_embedding_rect(jnp.asarray(not_mask)))
    np.testing.assert_array_equal(a, b)
