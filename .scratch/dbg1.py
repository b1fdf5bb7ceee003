import numpy as np
import jax, jax.numpy as jnp
from dfvod_tpu.ops import ms_deform_attn_xla
rng = np.random.default_rng(0)
H, W, M, D = 4, 4, 1, 2
value = rng.standard_normal((1, H*W, M, D))
loc = np.array([(2+0.5)/W, (1+0.5)/H]).reshape(1,1,1,1,1,2)
attw = np.ones((1,1,1,1,1))
out = np.asarray(ms_deform_attn_xla(value, ((H,W),), loc, attw))
print("dtype", out.dtype)
print("diff", np.abs(out[0,0]-value[0,1*W+2,0]).max())
