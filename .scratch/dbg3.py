import numpy as np, sys
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from dfvod_tpu.ops import ms_deform_attn_xla

rng = np.random.default_rng(0)
shapes = ((5,6),)
B,M,D,Lq,P = 1,2,3,4,2
S = sum(h*w for h,w in shapes)
value = rng.standard_normal((B,S,M,D))
loc = (rng.random((B,Lq,M,1,P,2))*1.4-0.2)
attw = rng.random((B,Lq,M,1,P))+1e-3
attw = attw/attw.sum(axis=(-1,-2),keepdims=True)

def f(v,l,a):
    return jnp.sum(jnp.sin(ms_deform_attn_xla(v, shapes, l, a)))
grads = jax.grad(f, argnums=(0,1,2))(value, loc, attw)
eps=1e-6
for argi,arg in enumerate((value,loc,attw)):
    g = np.asarray(grads[argi]); flat = arg.reshape(-1)
    bad=0
    for k in range(flat.size):
        pert = flat.copy(); pert[k]+=eps
        ap=[value,loc,attw]; ap[argi]=pert.reshape(arg.shape)
        pert2 = flat.copy(); pert2[k]-=eps
        am=[value,loc,attw]; am[argi]=pert2.reshape(arg.shape)
        num=(float(f(*ap))-float(f(*am)))/(2*eps)
        if abs(g.reshape(-1)[k]-num)>1e-4*abs(num)+1e-6:
            bad+=1
            if bad<4: print(f"arg{argi} k={k} analytic={g.reshape(-1)[k]:.8f} numeric={num:.8f}")
    print(f"arg{argi}: {bad}/{flat.size} bad")
