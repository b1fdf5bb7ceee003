"""Int8 serving quantization (W8A8) — the round-5 perf probe.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOP/s peak), which makes int8 the one unmeasured lever left on the
serving plateau (PERF.md: every bf16 component has a measured floor).
This module provides the quantized compute primitives plus a trace-time
mode switch; the model integrates them at two seams named by the
round-4 review: the ResNet-50 bottleneck convs
(``models/backbone_resnet.py``) and the transformer FFN linears
(``models/layers.py``).

Scheme (standard W8A8 dynamic quantization):
- weights: symmetric per-output-channel scales, computed from the
  (BN-folded) f32/bf16 weights at trace time — loop-invariant, so XLA
  hoists the quantization out of a serving loop exactly as a real
  deployment would pre-quantize;
- activations: symmetric per-tensor dynamic scale (``max|x|/127``) —
  data-dependent, recomputed per forward (an HBM-bandwidth-cheap
  reduction that fuses with the producer);
- accumulation in int32, dequantized by ``sx * sw[c]`` in f32, then cast
  back to the activation dtype.

The mode is a trace-time global (like ``jax.default_matmul_precision``),
toggled by the ``int8_mode`` context manager. It is captured during
tracing only: toggling it does NOT retrace an already-jitted function,
so enable it before the first call of the program you want quantized
(the bench/eval scripts do exactly that). Training never quantizes —
every integration point also requires ``deterministic``/``not train``.

No reference equivalent (the reference serves f32 CUDA eager); this is
TPU-runtime plumbing in the spirit of ``benchmark.py:31-66``.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_STATE = {"mode": "", "seams": None}


def _match(tag: str, seams) -> bool:
    """Tag matcher for the seam allowlist. Entries are exact tags
    (``"ffn"``, ``"conv3x3_c128"``) or ``*``-suffixed prefixes
    (``"conv3x3*"``)."""
    for s in seams:
        if s.endswith("*"):
            if tag.startswith(s[:-1]):
                return True
        elif tag == s:
            return True
    return False


def enabled(tag: str | None = None) -> bool:
    """True when int8 serving mode is active (trace-time check).

    With a ``tag``, also consults the seam allowlist: the round-5 micro
    probes showed int8 wins are shape-specific on this toolchain (big
    matmuls 5.3x, layer2-shaped 3x3 convs 2.5x, but 1x1 and
    layer3-shaped convs LOSE to the dynamic-quantize pass), so call
    sites self-describe and the bench sweeps seam sets."""
    if _STATE["mode"] != "int8":
        return False
    if tag is None or _STATE["seams"] is None:
        return True
    return _match(tag, _STATE["seams"])


def set_mode(mode: str, seams=None) -> None:
    """Process-wide switch (``""`` or ``"int8"``) for script entry points
    that quantize everything they trace from here on. ``seams`` (optional
    iterable of tags / ``*``-prefixes) restricts quantization to the
    matching call sites; None quantizes every seam."""
    assert mode in ("", "int8"), mode
    _STATE["mode"] = mode
    _STATE["seams"] = None if seams is None else frozenset(seams)


@contextlib.contextmanager
def int8_mode(on: bool = True, seams=None):
    prev = (_STATE["mode"], _STATE["seams"])
    _STATE["mode"] = "int8" if on else ""
    _STATE["seams"] = None if seams is None else frozenset(seams)
    try:
        yield
    finally:
        _STATE["mode"], _STATE["seams"] = prev


def quantize_weight(w, reduce_axes):
    """Symmetric per-channel int8 weights.

    Returns ``(wq int8, scale f32)`` with ``scale`` keepdims-shaped for
    broadcast against ``w``."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wq, s


@contextlib.contextmanager
def static_act_scale(scale: float):
    """Speed-ceiling diagnostic: replace the dynamic per-tensor activation
    max-reduction with a fixed scale (wrong numerics — bench only). It
    isolates how much of the int8 path's cost is the quantize pass vs the
    int8 op itself."""
    prev = _STATE.get("act_scale")
    _STATE["act_scale"] = float(scale)
    try:
        yield
    finally:
        _STATE["act_scale"] = prev


def quantize_act(x):
    """Symmetric per-tensor dynamic int8 activations: ``(xq, scale)``."""
    xf = x.astype(jnp.float32)
    if _STATE.get("act_scale") is not None:
        s = jnp.float32(_STATE["act_scale"])
    else:
        s = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def conv_int8(x, w, stride=(1, 1), padding=((0, 0), (0, 0)),
              rhs_dilation=(1, 1)):
    """W8A8 NHWC conv: int8 x int8 -> int32 on the MXU, dequantized.

    ``w`` is HWIO with any norm scaling already folded in; bias is the
    caller's job (it adds in the dequantized domain)."""
    wq, sw = quantize_weight(w, reduce_axes=(0, 1, 2))   # (1,1,1,O)
    xq, sx = quantize_act(x)
    yq = jax.lax.conv_general_dilated(
        xq, wq, stride, padding, rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = yq.astype(jnp.float32) * (sx * sw[0, 0, 0][None, None, None, :])
    return y.astype(x.dtype)


def dense_int8(x, kernel, bias=None):
    """W8A8 dense: ``x @ kernel + bias`` with int32 accumulation.

    ``x``: (..., K); ``kernel``: (K, N); per-output-column weight scales."""
    wq, sw = quantize_weight(kernel, reduce_axes=(0,))   # (1, N)
    xq, sx = quantize_act(x)
    yq = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = yq.astype(jnp.float32) * (sx * sw[0])
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
