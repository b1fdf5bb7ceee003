"""Round-5 int8 serving probe (VERDICT r4 task 3) — speed side.

Measures, with bench.py's tunnel-safe fori_loop methodology:
  1. int8 vs bf16 MXU micro rates (4096^3 matmul; R50-shaped convs) —
     establishes what the hardware/toolchain actually delivers for
     int8 x int8 -> int32 before blaming the model integration;
  2. the in-model serving forward at B=8 608x800 (LateFusion RGB-D,
     production config) bf16 vs int8 (``ops/quant.py`` seams: R50
     bottleneck convs + transformer FFNs).

Accuracy side: ``scripts/eval_oid_report.py --int8`` /
``scripts/eval_split_report.py --int8`` (mAP drift on the same
checkpoints). Results -> PERF.md "Round 5: int8 serving probe".

Run ONLY when no training queue owns the chip (1-core host +
chip-sharing hazard, .claude/skills/verify).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from dfvod_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from dfvod_tpu.data.device_pipeline import device_normalize
from dfvod_tpu.models import build_model
from dfvod_tpu.ops import quant
from dfvod_tpu.utils.config import Config, ModelConfig

H, W = 608, 800


def rpc_cost() -> float:
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_time(body, iters=30):
    """Seconds per body() call, fori_loop-chained (carry perturbs input)."""
    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.float32(0.0), 2))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), iters))
    return (time.perf_counter() - t0 - rpc) / iters


def micro_matmul():
    N = 4096
    rng = np.random.default_rng(0)
    a16 = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    a8 = jnp.clip(jnp.round(a16.astype(jnp.float32) * 10), -127,
                  127).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b16.astype(jnp.float32) * 10), -127,
                  127).astype(jnp.int8)
    flops = 2 * N ** 3

    def body_bf16(i, c):
        y = (a16 + c.astype(jnp.bfloat16)) @ b16
        return jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-9

    def body_int8(i, c):
        ai = a8 + c.astype(jnp.int8)
        y = jax.lax.dot_general(ai, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-9

    t_bf = chain_time(body_bf16)
    t_i8 = chain_time(body_int8)
    print(f"micro matmul {N}^3: bf16 {t_bf*1e3:.3f} ms "
          f"({flops/t_bf/1e12:.1f} TF/s) | int8 {t_i8*1e3:.3f} ms "
          f"({flops/t_i8/1e12:.1f} TOP/s) | speedup {t_bf/t_i8:.2f}x",
          flush=True)


def micro_conv():
    """R50 layer2/3-shaped convs, B=8 608x800 production spatial dims."""
    rng = np.random.default_rng(1)
    shapes = [
        ("layer2 3x3", (8, 76, 100, 128), (3, 3, 128, 128), 1),
        ("layer3 3x3", (8, 38, 50, 256), (3, 3, 256, 256), 1),
        ("layer4 3x3 dil2", (8, 38, 50, 512), (3, 3, 512, 512), 2),
        ("layer3 1x1x1024", (8, 38, 50, 256), (1, 1, 256, 1024), 1),
    ]
    for name, xs, ws, dil in shapes:
        x16 = jnp.asarray(rng.standard_normal(xs) * 0.5, jnp.bfloat16)
        w16 = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.bfloat16)
        x8 = jnp.clip(jnp.round(x16.astype(jnp.float32) * 30), -127,
                      127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(w16.astype(jnp.float32) * 100), -127,
                      127).astype(jnp.int8)
        pad = dil * (ws[0] - 1) // 2
        dn = ("NHWC", "HWIO", "NHWC")
        flops = 2 * xs[0] * xs[1] * xs[2] * ws[3] * ws[0] * ws[1] * ws[2]

        def body_bf16(i, c, x16=x16, w16=w16, pad=pad, dil=dil):
            y = jax.lax.conv_general_dilated(
                x16 + c.astype(jnp.bfloat16), w16, (1, 1),
                ((pad, pad), (pad, pad)), rhs_dilation=(dil, dil),
                dimension_numbers=dn)
            return jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-9

        def body_int8(i, c, x8=x8, w8=w8, pad=pad, dil=dil):
            y = jax.lax.conv_general_dilated(
                x8 + c.astype(jnp.int8), w8, (1, 1),
                ((pad, pad), (pad, pad)), rhs_dilation=(dil, dil),
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-9

        t_bf = chain_time(body_bf16)
        t_i8 = chain_time(body_int8)
        print(f"micro conv {name}: bf16 {t_bf*1e3:.3f} ms "
              f"({flops/t_bf/1e12:.1f} TF/s) | int8 {t_i8*1e3:.3f} ms "
              f"({flops/t_i8/1e12:.1f} TOP/s) | speedup "
              f"{t_bf/t_i8:.2f}x", flush=True)


def micro_dense_ffn():
    """Transformer FFN / projection-shaped dense at serving size
    (B=8 x 7600 tokens, d=256): grounds the seam-sweep expectations."""
    rng = np.random.default_rng(3)
    shapes = [("ffn 256->1024", (60800, 256), (256, 1024)),
              ("ffn 1024->256", (60800, 1024), (1024, 256)),
              ("proj 256->256", (60800, 256), (256, 256))]
    for name, xs, ws in shapes:
        x16 = jnp.asarray(rng.standard_normal(xs) * 0.5, jnp.bfloat16)
        w16 = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.bfloat16)
        flops = 2 * xs[0] * ws[0] * ws[1]

        def body_bf16(i, c, x16=x16, w16=w16):
            return jnp.tanh(jnp.sum((
                (x16 + c.astype(jnp.bfloat16)) @ w16
            ).astype(jnp.float32))) * 1e-9

        def body_int8(i, c, x16=x16, w16=w16):
            y = quant.dense_int8(x16 + c.astype(jnp.bfloat16), w16)
            return jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-9

        t_bf = chain_time(body_bf16)
        t_i8 = chain_time(body_int8)
        print(f"micro dense {name}: bf16 {t_bf*1e3:.3f} ms "
              f"({flops/t_bf/1e12:.1f} TF/s) | int8(W8A8 dyn) "
              f"{t_i8*1e3:.3f} ms ({flops/t_i8/1e12:.1f} TOP/s) | "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)


# Seam sets for the in-model sweep. "selective" = only the seams whose
# micro probes showed int8 wins (big FFN/proj matmuls; layer2- and
# layer4-shaped 3x3 convs); 1x1 and layer3-shaped convs stay bf16.
SWEEP = [
    ("int8-all", None, False),
    ("ffn+proj", ("ffn", "proj"), False),
    ("selective", ("ffn", "proj", "conv3x3_c128", "conv3x3_c512"), False),
    ("selective+staticact(diag)",
     ("ffn", "proj", "conv3x3_c128", "conv3x3_c512"), True),
]


def in_model(batch: int = 8, sweep: bool = False):
    cfg = ModelConfig(use_depth=True, fusion_type="LateFusion",
                      num_classes=3, dilation=True, with_box_refine=True,
                      compute_dtype="bfloat16")
    model, _, _ = build_model(Config(model=cfg))
    rng = np.random.default_rng(2)
    imgs_u8 = jnp.asarray(rng.integers(0, 254, (batch, H, W, 4)),
                          jnp.uint8)
    sizes = jnp.tile(jnp.array([[H, W]]), (batch, 1))
    img0, mask0 = device_normalize(imgs_u8, sizes)
    variables = jax.jit(lambda r: model.init(
        r, img0, mask0, train=False))(jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)

    def make_body():
        def body(i, c):
            x = imgs_u8 + (c > 0).astype(jnp.uint8)
            img, mask = device_normalize(x, sizes)
            out = model.apply(variables, img.astype(jnp.bfloat16), mask,
                              train=False)["pred_logits"]
            return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6
        return body

    t_bf = chain_time(make_body(), iters=15)
    print(f"in-model serving B={batch} {H}x{W} LateFusion: "
          f"bf16 {t_bf*1e3:.2f} ms ({batch/t_bf:.1f} f/s)", flush=True)
    configs = SWEEP if sweep else [("int8-all", None, False)]
    for label, seams, static in configs:
        import contextlib
        ctx = (quant.static_act_scale(0.05) if static
               else contextlib.nullcontext())
        with quant.int8_mode(seams=seams), ctx:
            t_i8 = chain_time(make_body(), iters=15)
        print(f"in-model serving B={batch} {label}: "
              f"{t_i8*1e3:.2f} ms ({batch/t_i8:.1f} f/s) | "
              f"speedup vs bf16 {t_bf/t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}", flush=True)
    if which in ("all", "micro"):
        micro_matmul()
        micro_conv()
    if which in ("all", "micro", "sweep"):
        micro_dense_ffn()
    if which in ("all", "model"):
        in_model()
    if which == "sweep":
        in_model(sweep=True)
