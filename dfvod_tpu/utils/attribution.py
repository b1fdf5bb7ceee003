"""Integrated-gradients input attribution.

TPU-native counterpart of the reference's dormant captum hooks
(``inference.py:896-905``: ``IntegratedGradients(model).attribute(img,
baseline=0, n_steps=50, return_convergence_delta=True)``) and of
``visualize_integrated_gradients`` (``inference.py:972-1026``, the 2x2
RGB/depth attribution figure). In JAX the path integral is a
``lax.scan`` of ``jax.grad`` steps inside one jit region — no hooks, no
internal batching knobs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(0, 3))
def integrated_gradients(score_fn, x, baseline=None, n_steps: int = 50):
    """IG along the straight-line path baseline -> x (midpoint rule).

    Args:
      score_fn: differentiable scalar function of ``x`` (e.g. the summed
        hand-class probability of kept detections).
      x: input array (any shape — e.g. (H, W, 4) RGB-D).
      baseline: same-shape start point; zeros when None (the reference's
        ``torch.zeros_like(img2)``).
      n_steps: path-integral resolution (reference: 50).

    Returns ``(attribution, delta)``: attribution has ``x``'s shape and
    sums approximately to ``score_fn(x) - score_fn(baseline)``
    (completeness); ``delta`` is that convergence residual.
    """
    x = jnp.asarray(x)
    if baseline is None:
        baseline = jnp.zeros_like(x)
    grad_fn = jax.grad(lambda z: jnp.asarray(score_fn(z), jnp.float32))
    alphas = (jnp.arange(n_steps, dtype=x.dtype) + 0.5) / n_steps

    def body(acc, a):
        return acc + grad_fn(baseline + a * (x - baseline)), None

    total, _ = jax.lax.scan(body, jnp.zeros_like(x, jnp.float32), alphas)
    attribution = (x - baseline).astype(jnp.float32) * total / n_steps
    delta = (score_fn(x) - score_fn(baseline)
             - attribution.sum()).astype(jnp.float32)
    return attribution, delta


def _minmax(a):
    lo, hi = float(np.min(a)), float(np.max(a))
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)


def visualize_integrated_gradients(img: np.ndarray,
                                   attribution: np.ndarray,
                                   path: str = "integrated_gradients.png"):
    """2x2 figure: RGB / RGB attributions / depth / depth attribution
    (``inference.py:972-1026``). ``img``/``attribution``: (H, W, 4)
    channels-last RGB-D."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    assert img.shape == attribution.shape, (img.shape, attribution.shape)
    img = _minmax(np.asarray(img, np.float32))
    attribution = _minmax(np.asarray(attribution, np.float32))

    fig, axs = plt.subplots(2, 2, figsize=(10, 6))
    axs[0, 0].imshow(img[..., :3])
    axs[0, 0].set_title("RGB Channels")
    axs[0, 1].imshow(attribution[..., :3])
    axs[0, 1].set_title("RGB Attributions")
    axs[1, 0].imshow(img[..., 3], cmap="gray")
    axs[1, 0].set_title("Depth Channel")
    depth_im = axs[1, 1].imshow(attribution[..., 3])
    axs[1, 1].set_title("Depth Attribution")
    for ax in axs.ravel():
        ax.axis("off")
    fig.colorbar(depth_im, ax=axs, orientation="vertical", fraction=0.05,
                 pad=0.01, shrink=0.5).set_label("Attribution Intensity")
    fig.savefig(path)
    plt.close(fig)
    return path
