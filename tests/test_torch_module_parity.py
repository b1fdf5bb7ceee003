"""Module-level torch parity: a faithful torch replica of the reference's
MSDeformAttn module (``models/ops/modules/ms_deform_attn.py:28-117`` with
the grid_sample oracle as its kernel) and encoder layer
(``deformable_transformer_single.py:520-563``) is built, its state dict is
run through the checkpoint converter, and the converted flax modules must
reproduce its outputs — validating the converter naming, the module math
(offset ring init, softmax, residual/LN/FFN order) and the kernel
semantics in one chain."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def grid_sample_msda(value, shapes, loc, attw):
    """``ms_deform_attn_core_pytorch`` semantics
    (``ms_deform_attn_func.py:41-61``)."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    samples = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(
            N * M, D, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        samples.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
    attw = attw.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * attw).sum(-1)
    return out.view(N, M * D, Lq).transpose(1, 2).contiguous()


class TorchMSDeformAttn(tnn.Module):
    """Reference module (``ms_deform_attn.py:28-117``) with the torch
    oracle as kernel."""

    def __init__(self, d_model, n_levels, n_heads, n_points):
        super().__init__()
        self.n_levels, self.n_heads, self.n_points = (n_levels, n_heads,
                                                      n_points)
        self.d_model = d_model
        self.sampling_offsets = tnn.Linear(
            d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = tnn.Linear(
            d_model, n_heads * n_levels * n_points)
        self.value_proj = tnn.Linear(d_model, d_model)
        self.output_proj = tnn.Linear(d_model, d_model)
        # ring-of-directions bias init (``:62-76``)
        tnn.init.constant_(self.sampling_offsets.weight, 0.0)
        thetas = torch.arange(n_heads, dtype=torch.float32) * (
            2.0 * math.pi / n_heads)
        grid = torch.stack([thetas.cos(), thetas.sin()], -1)
        grid = (grid / grid.abs().max(-1, keepdim=True)[0]).view(
            n_heads, 1, 1, 2).repeat(1, n_levels, n_points, 1)
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        with torch.no_grad():
            self.sampling_offsets.bias = tnn.Parameter(grid.reshape(-1))

    def forward(self, query, reference_points, value_in, shapes,
                padding_mask=None):
        N, Lq, _ = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M
        value = self.value_proj(value_in)
        if padding_mask is not None:
            value = value.masked_fill(padding_mask[..., None], 0.0)
        value = value.view(N, -1, M, D)
        offsets = self.sampling_offsets(query).view(N, Lq, M, L, P, 2)
        attw = self.attention_weights(query).view(N, Lq, M, L * P)
        attw = attw.softmax(-1).view(N, Lq, M, L, P)
        wh = torch.as_tensor([[w, h] for h, w in shapes],
                             dtype=torch.float32)
        loc = (reference_points[:, :, None, :, None, :]
               + offsets / wh[None, None, None, :, None, :])
        out = grid_sample_msda(value, shapes, loc, attw)
        return self.output_proj(out)


class TorchEncoderLayer(tnn.Module):
    """``DeformableTransformerEncoderLayer`` (``:520-563``)."""

    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points):
        super().__init__()
        self.self_attn = TorchMSDeformAttn(d_model, n_levels, n_heads,
                                           n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm2 = tnn.LayerNorm(d_model)

    def forward(self, src, pos, ref, shapes, mask=None):
        src2 = self.self_attn(src + pos, ref, src, shapes, mask)
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


def make_inputs(rng, B=2, C=32, M=4, P=4, shapes=((6, 9),)):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    src = rng.standard_normal((B, S, C)).astype(np.float32)
    pos = rng.standard_normal((B, S, C)).astype(np.float32)
    ref = rng.uniform(0.1, 0.9, (B, S, L, 2)).astype(np.float32)
    return src, pos, ref, shapes


class TestEncoderLayerParity:
    def test_full_chain(self, rng):
        import jax
        import jax.numpy as jnp
        from dfvod_tpu.models.transformer import (
            DeformableTransformerEncoderLayer,
        )
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )

        C, M, P = 32, 4, 4
        src, pos, ref, shapes = make_inputs(rng, C=C, M=M, P=P)
        tl = TorchEncoderLayer(C, 64, len(shapes), M, P).eval()
        # randomize the zero-init'd projections so parity is non-trivial
        with torch.no_grad():
            tl.self_attn.sampling_offsets.weight.normal_(0, 0.02)
            tl.self_attn.attention_weights.weight.normal_(0, 0.2)
            tl.self_attn.attention_weights.bias.normal_(0, 0.2)
        with torch.no_grad():
            ref_out = tl(torch.from_numpy(src), torch.from_numpy(pos),
                         torch.from_numpy(ref), shapes).numpy()

        sd = {f"transformer.encoder.layers.0.{k}": v.detach().numpy()
              for k, v in tl.state_dict().items()}
        params, _, unmapped = convert_reference_state_dict(sd,
                                                           verbose=False)
        assert unmapped == []
        p = params["transformer"]["encoder_layers_0"]

        layer = DeformableTransformerEncoderLayer(
            d_model=C, d_ffn=64, dropout=0.0, n_levels=len(shapes),
            n_heads=M, n_points=P)
        got = layer.apply({"params": p}, jnp.asarray(src),
                          jnp.asarray(pos), jnp.asarray(ref), shapes)
        np.testing.assert_allclose(np.asarray(got), ref_out,
                                   atol=2e-5, rtol=1e-4)

    def test_with_padding_mask(self, rng):
        import jax.numpy as jnp
        from dfvod_tpu.models.transformer import (
            DeformableTransformerEncoderLayer,
        )
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        C, M, P = 32, 4, 4
        src, pos, ref, shapes = make_inputs(rng, C=C, M=M, P=P)
        S = src.shape[1]
        mask = np.zeros((2, S), bool)
        mask[:, -10:] = True
        tl = TorchEncoderLayer(C, 64, len(shapes), M, P).eval()
        with torch.no_grad():
            tl.self_attn.attention_weights.weight.normal_(0, 0.2)
            ref_out = tl(torch.from_numpy(src), torch.from_numpy(pos),
                         torch.from_numpy(ref), shapes,
                         torch.from_numpy(mask)).numpy()
        sd = {f"transformer.encoder.layers.0.{k}": v.detach().numpy()
              for k, v in tl.state_dict().items()}
        params, _, _ = convert_reference_state_dict(sd, verbose=False)
        layer = DeformableTransformerEncoderLayer(
            d_model=C, d_ffn=64, dropout=0.0, n_levels=len(shapes),
            n_heads=M, n_points=P)
        got = layer.apply(
            {"params": params["transformer"]["encoder_layers_0"]},
            jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ref), shapes,
            jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), ref_out,
                                   atol=2e-5, rtol=1e-4)


class TorchDecoderLayer(tnn.Module):
    """``DeformableTransformerDecoderLayer`` (``:596-648``)."""

    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points):
        super().__init__()
        self.cross_attn = TorchMSDeformAttn(d_model, n_levels, n_heads,
                                            n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.self_attn = tnn.MultiheadAttention(d_model, n_heads,
                                                dropout=0.0)
        self.norm2 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, tgt, query_pos, ref, src, shapes):
        q = k = (tgt + query_pos).transpose(0, 1)
        tgt2 = self.self_attn(q, k, tgt.transpose(0, 1))[0].transpose(0, 1)
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.cross_attn(tgt + query_pos, ref, src, shapes)
        tgt = self.norm1(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class TorchDepthFusionLayer(tnn.Module):
    """``DepthDeformableTransformerEncoderLayer``
    (``deformable_transformer_single.py:341-402``)."""

    def __init__(self, d_model, n_heads, n_points):
        super().__init__()
        self.cross_attn = TorchMSDeformAttn(d_model, 1, n_heads, n_points)
        self.norm1 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_model)
        self.norm3 = tnn.LayerNorm(d_model)
        self.depth_scale_adapt = tnn.Linear(d_model, d_model)
        self.norm_depth_scale = tnn.LayerNorm(d_model)
        self.cross_scale_adapt = tnn.Linear(d_model, d_model)

    def forward(self, tgt, query_pos, ref, src, src_shapes):
        src = self.norm_depth_scale(self.depth_scale_adapt(src))
        tgt2 = self.cross_attn(tgt + query_pos, ref, src, src_shapes)
        tgt2 = self.cross_scale_adapt(tgt2)
        tgt = self.norm1(tgt + tgt2)
        tgt2 = F.gelu(self.linear1(tgt))
        return self.norm3(tgt + tgt2)


class TestDecoderLayerParity:
    def test_full_chain(self, rng):
        import jax.numpy as jnp
        from dfvod_tpu.models.transformer import (
            DeformableTransformerDecoderLayer,
        )
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        C, M, P, Q = 32, 4, 4, 12
        src, pos, _, shapes = make_inputs(rng, C=C, M=M, P=P)
        B, S, _ = src.shape
        tgt = rng.standard_normal((B, Q, C)).astype(np.float32)
        qpos = rng.standard_normal((B, Q, C)).astype(np.float32)
        ref = rng.uniform(0.1, 0.9, (B, Q, 1, 2)).astype(np.float32)
        tl = TorchDecoderLayer(C, 64, len(shapes), M, P).eval()
        with torch.no_grad():
            tl.cross_attn.sampling_offsets.weight.normal_(0, 0.02)
            tl.cross_attn.attention_weights.weight.normal_(0, 0.2)
            ref_out = tl(torch.from_numpy(tgt), torch.from_numpy(qpos),
                         torch.from_numpy(ref), torch.from_numpy(src),
                         shapes).numpy()
        sd = {f"transformer.decoder.layers.0.{k}": v.detach().numpy()
              for k, v in tl.state_dict().items()}
        params, _, unmapped = convert_reference_state_dict(sd,
                                                           verbose=False)
        assert unmapped == []
        layer = DeformableTransformerDecoderLayer(
            d_model=C, d_ffn=64, dropout=0.0, n_levels=len(shapes),
            n_heads=M, n_points=P)
        got = layer.apply(
            {"params": params["transformer"]["decoder_layers_0"]},
            jnp.asarray(tgt), jnp.asarray(qpos), jnp.asarray(ref),
            jnp.asarray(src), shapes)
        np.testing.assert_allclose(np.asarray(got), ref_out,
                                   atol=2e-5, rtol=1e-4)


class TestDepthFusionLayerParity:
    def test_latefusion_layer(self, rng):
        import jax.numpy as jnp
        from dfvod_tpu.models.transformer import DepthFusionLayer
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        C, M, P = 32, 4, 4
        rgb, pos, ref, shapes = make_inputs(rng, C=C, M=M, P=P)
        depth_shapes = shapes
        depth = rng.standard_normal(rgb.shape).astype(np.float32)
        tl = TorchDepthFusionLayer(C, M, P).eval()
        with torch.no_grad():
            tl.cross_attn.sampling_offsets.weight.normal_(0, 0.02)
            tl.cross_attn.attention_weights.weight.normal_(0, 0.2)
            ref_out = tl(torch.from_numpy(rgb), torch.from_numpy(pos),
                         torch.from_numpy(ref), torch.from_numpy(depth),
                         depth_shapes).numpy()
        sd = {f"transformer.depth_encoder_layer.{k}": v.detach().numpy()
              for k, v in tl.state_dict().items()}
        params, _, unmapped = convert_reference_state_dict(sd,
                                                           verbose=False)
        assert unmapped == []
        layer = DepthFusionLayer(d_model=C, dropout=0.0, n_levels=1,
                                 n_heads=M, n_points=P,
                                 ffn_activation="gelu")
        got = layer.apply(
            {"params": params["transformer"]["depth_encoder_layer"]},
            jnp.asarray(rgb), jnp.asarray(pos), jnp.asarray(ref),
            jnp.asarray(depth), depth_shapes)
        np.testing.assert_allclose(np.asarray(got), ref_out,
                                   atol=2e-5, rtol=1e-4)


class TorchTQELayer(tnn.Module):
    """``TemporalQueryEncoderLayer``
    (``deformable_transformer_multi.py:560-610``)."""

    def __init__(self, d_model, d_ffn, n_heads):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d_model, n_heads,
                                                dropout=0.0)
        self.norm2 = tnn.LayerNorm(d_model)
        self.cross_attn = tnn.MultiheadAttention(d_model, n_heads,
                                                 dropout=0.0)
        self.norm1 = tnn.LayerNorm(d_model)
        self.linear1 = tnn.Linear(d_model, d_ffn)
        self.linear2 = tnn.Linear(d_ffn, d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, query, ref_query):
        q = k = query.transpose(0, 1)
        t2 = self.self_attn(q, k, query.transpose(0, 1))[0].transpose(0, 1)
        tgt = self.norm2(query + t2)
        t2 = self.cross_attn(tgt.transpose(0, 1),
                             ref_query.transpose(0, 1),
                             ref_query.transpose(0, 1))[0].transpose(0, 1)
        tgt = self.norm1(tgt + t2)
        t2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + t2)


class TorchDynamicConv(tnn.Module):
    """``sparse_roi_head/head.py:127-172`` (dim_dynamic=64, 2 kernels)."""

    def __init__(self, d_model, dim_dynamic=64, pooler=7):
        super().__init__()
        self.d, self.dd = d_model, dim_dynamic
        self.num_params = d_model * dim_dynamic
        self.dynamic_layer = tnn.Linear(d_model, 2 * self.num_params)
        self.norm1 = tnn.LayerNorm(dim_dynamic)
        self.norm2 = tnn.LayerNorm(d_model)
        self.out_layer = tnn.Linear(d_model * pooler ** 2, d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, pro, roi):
        # pro (1, NR, C); roi (49, NR, C)
        feats = roi.permute(1, 0, 2)
        params = self.dynamic_layer(pro).permute(1, 0, 2)
        p1 = params[:, :, :self.num_params].view(-1, self.d, self.dd)
        p2 = params[:, :, self.num_params:].view(-1, self.dd, self.d)
        feats = F.relu(self.norm1(torch.bmm(feats, p1)))
        feats = F.relu(self.norm2(torch.bmm(feats, p2)))
        feats = self.out_layer(feats.flatten(1))
        return F.relu(self.norm3(feats))


class TorchRCNNHead(tnn.Module):
    """``sparse_roi_head/head.py:31-83`` with dropout 0."""

    def __init__(self, d_model, pooler=7):
        super().__init__()
        self.d_model = d_model
        self.self_attn = tnn.MultiheadAttention(d_model, 8, dropout=0.0)
        self.inst_interact = TorchDynamicConv(d_model, pooler=pooler)
        self.linear1 = tnn.Linear(d_model, 2048)
        self.linear2 = tnn.Linear(2048, d_model)
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm2 = tnn.LayerNorm(d_model)
        self.norm3 = tnn.LayerNorm(d_model)

    def forward(self, roi_features, pro_features):
        # roi_features (49, N*R, C); pro_features (N, R, C)
        N, R = pro_features.shape[:2]
        pro = pro_features.view(N, R, self.d_model).permute(1, 0, 2)
        pro2 = self.self_attn(pro, pro, value=pro)[0]
        pro = self.norm1(pro + pro2)
        pro = pro.view(R, N, self.d_model).permute(1, 0, 2).reshape(
            1, N * R, self.d_model)
        pro2 = self.inst_interact(pro, roi_features)
        obj = self.norm2(pro + pro2)
        obj2 = self.linear2(F.relu(self.linear1(obj)))
        return self.norm3(obj + obj2)


class TestTemporalParity:
    def test_tqe_layer(self, rng):
        import jax.numpy as jnp
        from dfvod_tpu.models.temporal import TemporalQueryEncoderLayer
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        C, M = 32, 4
        B, Q, R = 2, 6, 10
        q = rng.standard_normal((B, Q, C)).astype(np.float32)
        r = rng.standard_normal((B, R, C)).astype(np.float32)
        tl = TorchTQELayer(C, 64, M).eval()
        with torch.no_grad():
            ref_out = tl(torch.from_numpy(q), torch.from_numpy(r)).numpy()
        sd = {f"transformer.temporal_query_layer1.{k}": v.detach().numpy()
              for k, v in tl.state_dict().items()}
        params, _, unmapped = convert_reference_state_dict(sd,
                                                           verbose=False)
        assert unmapped == []
        layer = TemporalQueryEncoderLayer(C, 64, 0.0, M)
        got = layer.apply({"params": params["temporal_query_layer1"]},
                          jnp.asarray(q), jnp.asarray(r))
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=2e-5,
                                   rtol=1e-4)

    def test_rcnn_head_qrf(self, rng):
        import jax.numpy as jnp
        from dfvod_tpu.models.temporal import RCNNHead
        from dfvod_tpu.utils.convert_reference import (
            convert_reference_state_dict,
        )
        C, B, R, P = 32, 2, 5, 7
        pro = rng.standard_normal((B, R, C)).astype(np.float32)
        roi = rng.standard_normal((B, R, P, P, C)).astype(np.float32)
        tl = TorchRCNNHead(C, pooler=P).eval()
        with torch.no_grad():
            # torch contract: roi (P*P, N*R, C)
            roi_t = torch.from_numpy(
                roi.reshape(B * R, P * P, C).transpose(1, 0, 2))
            ref_out = tl(roi_t, torch.from_numpy(pro)).numpy()
        ref_out = ref_out.reshape(B, R, C)
        sd = {f"transformer.dynamic_layer_for_current_query1.{k}":
              v.detach().numpy() for k, v in tl.state_dict().items()}
        params, _, unmapped = convert_reference_state_dict(sd,
                                                           verbose=False)
        assert unmapped == []
        head = RCNNHead(C, pooler_resolution=P)
        got = head.apply({"params": params["qrf_dynamic_layer1"]},
                         jnp.asarray(roi), jnp.asarray(pro))
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=2e-5,
                                   rtol=1e-4)
