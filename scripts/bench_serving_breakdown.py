"""Attribute the serving forward's unexplained time (the "rest ~9 ms").

PERF.md's component table covers backbone/DFormer/encoder-MSDA/decoder-MSDA
but lumps ~25% of the B=8 bf16 forward into "rest". This times every
remaining piece at the production shape (B=8, 608x800, single stride-16
level, S=1900 tokens, Q=300) so optimization effort goes where the time is.

Same tunnel-safe methodology as ``bench_components.py``: iterations chained
on device through a carry that perturbs the inputs, one readback at the end,
RPC round-trip subtracted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 608, 800
FH, FW = H // 16, W // 16          # stride-16 feature grid (DC5)
S = FH * FW                        # 1900 tokens
Q = 300
D = 256


def rpc_cost():
    x = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure(make_out, iters=30):
    """make_out: c (bf16 scalar) -> array; chained via tanh-sum carry."""
    def body(i, c):
        out = make_out(c)
        return (jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-6
                ).astype(c.dtype)

    loop = jax.jit(lambda c0, n: jax.lax.fori_loop(0, n, body, c0))
    float(loop(jnp.bfloat16(0.0), jnp.int32(2)))
    rpc = rpc_cost()
    t0 = time.perf_counter()
    float(loop(jnp.bfloat16(0.0), jnp.int32(iters)))
    return (time.perf_counter() - t0 - rpc) / iters


def to16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def rand(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    rows = []

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:42s} {ms * 1e3:7.3f} ms", flush=True)

    # ---- preprocess: uint8 H2D image -> normalized tensor + mask
    from dfvod_tpu.data.device_pipeline import device_normalize
    imgs_u8 = jnp.asarray(rng.integers(0, 254, (B, H, W, 4)), jnp.uint8)
    sizes = jnp.tile(jnp.array([[H, W]]), (B, 1))
    report("device_normalize (uint8->bf16 + mask)", measure(
        lambda c: device_normalize(
            imgs_u8 + (c > 0).astype(jnp.uint8), sizes)[0]))

    # ---- sine position embedding over the feature mask
    from dfvod_tpu.models.position_encoding import sine_position_embedding
    fmask = jnp.zeros((B, FH, FW), bool)
    report("sine_position_embedding (38x50)", measure(
        lambda c: sine_position_embedding(
            ~fmask, D // 2) + c.astype(jnp.float32)))

    # ---- input projections (1x1 conv + GroupNorm)
    from dfvod_tpu.models.detr import InputProj
    feat4 = rand(B, FH, FW, 2048)
    proj = InputProj(D)
    pvars = to16(jax.jit(proj.init)(key, feat4))
    report("input_proj 2048->256 + GN", measure(
        lambda c: proj.apply(pvars, feat4 + c)))
    dfeat = rand(B, FH, FW, 128)
    dvars = to16(jax.jit(proj.init)(key, dfeat))
    report("input_proj_depth 128->256 + GN", measure(
        lambda c: proj.apply(dvars, dfeat + c)))

    # ---- token-stream layers
    from dfvod_tpu.models.transformer import (
        DeformableTransformerDecoderLayer,
        DeformableTransformerEncoderLayer,
        DepthFusionLayer,
        DetectionHead,
    )
    tokens = rand(B, S, D)
    pos = rand(B, S, D)
    ref_enc = jnp.asarray(rng.uniform(0.1, 0.9, (B, S, 1, 2)), jnp.bfloat16)
    shapes = ((FH, FW),)

    lf = DepthFusionLayer(D, 0.0, 1, 8, 4)
    lfv = to16(jax.jit(lambda r: lf.init(
        r, tokens, pos, ref_enc, tokens, shapes, None))(key))
    report("LateFusion depth layer (1x)", measure(
        lambda c: lf.apply(lfv, tokens + c, pos, ref_enc, tokens + c,
                           shapes, None)))

    enc = DeformableTransformerEncoderLayer(D, 1024, 0.0, "relu", 1, 8, 4)
    encv = to16(jax.jit(lambda r: enc.init(
        r, tokens, pos, ref_enc, shapes, None, True))(key))
    enc_ms = measure(lambda c: enc.apply(encv, tokens + c, pos, ref_enc,
                                         shapes, None, True))
    report("encoder layer (1x, MSDA+FFN)", enc_ms)

    from dfvod_tpu.models.layers import FFN
    ffn = FFN(D, 1024, 0.0, "relu")
    ffnv = to16(jax.jit(lambda r: ffn.init(r, tokens))(key))
    report("encoder FFN alone (1x, S=1900)", measure(
        lambda c: ffn.apply(ffnv, tokens + c)))

    qtokens = rand(B, Q, D)
    qpos = rand(B, Q, D)
    ref_dec = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, 1, 2)), jnp.bfloat16)
    dec = DeformableTransformerDecoderLayer(D, 1024, 0.0, "relu", 1, 8, 4)
    decv = to16(jax.jit(lambda r: dec.init(
        r, qtokens, qpos, ref_dec, tokens, shapes, None))(key))
    report("decoder layer (1x, Q=300)", measure(
        lambda c: dec.apply(decv, qtokens + c, qpos, ref_dec, tokens + c,
                            shapes, None)))

    head = DetectionHead(D, 3)
    headv = to16(jax.jit(lambda r: head.init(r, qtokens))(key))
    report("detection head (1x, Q=300)", measure(
        lambda c: head.apply(headv, qtokens + c)[1]))

    # ---- round 3: the previously-unattributed pieces ------------------
    # backbone + DFormer measured IN THIS script (same methodology) so
    # the sum is internally consistent
    from dfvod_tpu.models.backbone_resnet import ResNet50
    from dfvod_tpu.models.backbone_dformer import DFormerBackbone
    rgb = rand(B, H, W, 3)
    r50 = ResNet50(dilation=True, return_stages=(4,))
    r50v = to16(jax.jit(lambda r: r50.init(r, rgb, train=False))(key))
    report("ResNet50 trunk (608x800)", measure(
        lambda c: r50.apply(r50v, rgb + c, train=False)[4]))
    dimg = rand(B, H, W, 1)
    imask0 = jnp.zeros((B, H, W), bool)
    df = DFormerBackbone()
    dfv = to16(jax.jit(lambda r: df.init(r, dimg, imask0,
                                         train=False))(key))
    report("DFormer stem (608x800)", measure(
        lambda c: df.apply(dfv, dimg + c, imask0, train=False)[0]))

    # transformer prologue: mask interp to the grid + flatten/level-embed
    # + valid ratios + reference-point grid
    from dfvod_tpu.models.transformer import (
        encoder_reference_points,
        flatten_levels,
        get_valid_ratio,
    )
    imask = jnp.zeros((B, H, W), bool)
    lvl = rand(1, D)

    def prologue(c):
        fm = jax.image.resize(imask.astype(jnp.float32), (B, FH, FW),
                              "nearest") > 0.5
        sf, mf, pf, shp = flatten_levels([feat4[..., :D] + c], [fm],
                                         [pos.reshape(B, FH, FW, D)], lvl)
        vr = jnp.stack([get_valid_ratio(m) for m in [fm]], axis=1)
        ref = encoder_reference_points(shp, vr)
        return sf + ref.sum() + vr.sum() + mf.sum()

    report("prologue (mask/flatten/valid/refpts)", measure(prologue))

    # refine epilogue: per-layer head output -> sigmoid chain, 6x
    from dfvod_tpu.models.transformer import refine_reference
    deltas = rand(B, Q, 4)

    def epilogue(c):
        refp = jax.nn.sigmoid((deltas + c).astype(jnp.float32))[..., :4]
        outs = []
        for _ in range(6):
            refp = refine_reference(deltas.astype(jnp.float32), refp)
            outs.append(refp)
        return jnp.stack(outs)

    report("refine chain + output stack (6x)", measure(epilogue))

    # ---- decoder-stack floor probe: Python loop vs lax.scan over the 6
    # layers (stacked params). Same math; tests whether the 6x sequential
    # Q=300 glue is scheduling/launch-bound or irreducible.
    decvs = [to16(jax.jit(lambda r: dec.init(
        r, qtokens, qpos, ref_dec, tokens, shapes, None))(
        jax.random.PRNGKey(i))) for i in range(6)]

    def six_loop(c):
        out = qtokens + c
        for v in decvs:
            out = dec.apply(v, out, qpos, ref_dec, tokens, shapes, None)
        return out

    report("decoder 6x (python loop)", measure(six_loop))

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *decvs)

    def six_scan(c):
        def body(carry, v):
            return dec.apply(v, carry, qpos, ref_dec, tokens, shapes,
                             None), None
        out, _ = jax.lax.scan(body, qtokens + c, stacked)
        return out

    report("decoder 6x (lax.scan stacked)", measure(six_scan))

    # ---- whole-model reference points
    from dfvod_tpu.models import build_model
    from dfvod_tpu.utils.config import Config, ModelConfig
    cfg = Config(model=ModelConfig(use_depth=True, fusion_type="LateFusion",
                                   compute_dtype="bfloat16"))
    model, _, _ = build_model(cfg)
    x4 = rand(B, H, W, 4)
    mask = jnp.zeros((B, H, W), bool)
    mvars = to16(jax.jit(lambda r: model.init(r, x4, mask,
                                              train=False))(key))
    full_ms = measure(lambda c: model.apply(
        mvars, x4 + c, mask, train=False)["pred_logits"])
    report("full forward (no preprocess)", full_ms)

    known = dict(rows)
    accounted = (known["LateFusion depth layer (1x)"]
                 + 6 * known["encoder layer (1x, MSDA+FFN)"]
                 + 6 * known["decoder layer (1x, Q=300)"]
                 + 6 * known["detection head (1x, Q=300)"]
                 + known["input_proj 2048->256 + GN"]
                 + known["input_proj_depth 128->256 + GN"]
                 + known["sine_position_embedding (38x50)"] * 2
                 + known["ResNet50 trunk (608x800)"]
                 + known["DFormer stem (608x800)"]
                 + known["prologue (mask/flatten/valid/refpts)"]
                 + known["refine chain + output stack (6x)"])
    print(f"\naccounted (all components, this script): "
          f"{accounted * 1e3:.2f} ms")
    print(f"full forward:               {full_ms * 1e3:.2f} ms "
          f"({100 * accounted / full_ms:.1f}% accounted)")


if __name__ == "__main__":
    main()
