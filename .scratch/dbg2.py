import numpy as np
import sys
sys.path.insert(0, '/root/repo')
from dfvod_tpu.ops import ms_deform_attn_xla

def make_inputs(rng, B=2, M=4, D=8, Lq=13, P=3, spatial_shapes=((6,9),(4,5)), dtype=np.float64):
    L = len(spatial_shapes)
    S = sum(h*w for h,w in spatial_shapes)
    value = rng.standard_normal((B,S,M,D)).astype(dtype)
    loc = (rng.random((B,Lq,M,L,P,2))*1.4-0.2).astype(dtype)
    attw = rng.random((B,Lq,M,L,P)).astype(dtype)+1e-3
    attw = attw/attw.sum(axis=(-1,-2),keepdims=True)
    return value, loc, attw

rng = np.random.default_rng(0)
shapes = ((6,9),(4,5))
value, loc, attw = make_inputs(rng, spatial_shapes=shapes)
got = np.asarray(ms_deform_attn_xla(value, shapes, loc, attw))
print("jax dtype:", got.dtype)

import torch, torch.nn.functional as F
tv, tl, ta = map(torch.from_numpy, (value, loc, attw))
B,S,M,D = value.shape
_,Lq,_,L,P,_ = loc.shape
splits = [h*w for h,w in shapes]
vals = tv.split(splits, dim=1)
grids = 2*tl-1
sampled=[]
for l,(H,W) in enumerate(shapes):
    v = vals[l].flatten(2).transpose(1,2).reshape(B*M,D,H,W)
    g = grids[:,:,:,l].transpose(1,2).flatten(0,1)
    s = F.grid_sample(v,g,mode='bilinear',padding_mode='zeros',align_corners=False)
    sampled.append(s)
attw_t = ta.transpose(1,2).reshape(B*M,1,Lq,L*P)
out = (torch.stack(sampled,dim=-2).flatten(-2)*attw_t).sum(-1)
exp = out.view(B,M*D,Lq).transpose(1,2).contiguous().numpy()
print("torch dtype:", exp.dtype)
d = np.abs(got-exp)
print("max abs diff", d.max())
idx = np.unravel_index(d.argmax(), d.shape)
print("at", idx, got[idx], exp[idx])
