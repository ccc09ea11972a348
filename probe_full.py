import time, jax, jax.numpy as jnp
from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
model = GIMMVFI_R(raft_iters=20)
img = jnp.zeros((1,2,128,128,3), jnp.float32)
var_shapes = jax.eval_shape(lambda r, x: model.init(r, x, (0.5,)), jax.random.PRNGKey(0), img)
variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)
fn = jax.jit(lambda v, x: model.apply(v, x, (0.5,), method=model.interpolate)["imgt_pred"][0])
t=time.time(); out = jax.block_until_ready(fn(variables, img)); print(f"first {time.time()-t:.2f}s", flush=True)
for i in range(4):
    t=time.time(); out = jax.block_until_ready(fn(variables, img)); print(f"run{i} {time.time()-t:.3f}s", flush=True)
