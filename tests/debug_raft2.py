import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import ref_compat
ref_compat.install_stubs()
import argparse, torch
from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT
from src.models.generalizable_INR.raft.corr import CorrBlock
from src.models.generalizable_INR.raft.utils.utils import coords_grid as t_coords_grid
import jax.numpy as jnp
from gimmvfi_tpu.flow.raft import RAFT, BasicUpdateBlock, convex_upsample_8x
from gimmvfi_tpu.ops import corr as corr_ops
from gimmvfi_tpu.ops.coords import coords_grid
from gimmvfi_tpu.utils.convert import convert_raft

rng = np.random.default_rng(1)
args = argparse.Namespace(small=False, mixed_precision=False, alternate_corr=False, dropout=0)
torch.manual_seed(0)
ref = TorchRAFT(args); ref.eval()
sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params, stats = convert_raft(sd)

hw = 16
fmap1 = rng.standard_normal((1, hw, hw, 256), dtype=np.float32)
fmap2 = rng.standard_normal((1, hw, hw, 256), dtype=np.float32)
net0 = np.tanh(rng.standard_normal((1, hw, hw, 128), dtype=np.float32))
inp0 = np.maximum(rng.standard_normal((1, hw, hw, 128), dtype=np.float32), 0)

tf1 = torch.from_numpy(fmap1.transpose(0,3,1,2).copy())
tf2 = torch.from_numpy(fmap2.transpose(0,3,1,2).copy())
tnet = torch.from_numpy(net0.transpose(0,3,1,2).copy())
tinp = torch.from_numpy(inp0.transpose(0,3,1,2).copy())

with torch.no_grad():
    corr_fn = CorrBlock(tf1, tf2, radius=4)
    c0 = t_coords_grid(1, hw, hw, device=tf1.device)
    corr_t = corr_fn(c0)
    net2_t, upm_t, dflow_t = ref.update_block(tnet, tinp, corr_t, c0 - c0)

pyr = corr_ops.corr_pyramid(jnp.asarray(fmap1), jnp.asarray(fmap2), 4)
corr_j = corr_ops.corr_lookup(pyr, coords_grid(1, hw, hw), 4)
print("corr err:", np.abs(np.asarray(corr_j) - corr_t.numpy().transpose(0,2,3,1)).max())

ub = BasicUpdateBlock(128)
ubv = {"params": params["refine"]["update_block"]}
net2, upm, dflow = ub.apply(ubv, jnp.asarray(net0), jnp.asarray(inp0), corr_j, jnp.zeros((1,hw,hw,2)))
print("net2 err:", np.abs(np.asarray(net2) - net2_t.numpy().transpose(0,2,3,1)).max())
print("upm err:", np.abs(np.asarray(upm) - upm_t.numpy().transpose(0,2,3,1)).max())
print("dflow err:", np.abs(np.asarray(dflow) - dflow_t.numpy().transpose(0,2,3,1)).max())

# convex upsample parity
flow = rng.standard_normal((1, hw, hw, 2), dtype=np.float32)
mask = rng.standard_normal((1, hw, hw, 576), dtype=np.float32)
up_j = convex_upsample_8x(jnp.asarray(flow), jnp.asarray(mask))
with torch.no_grad():
    up_t = ref.upsample_flow(torch.from_numpy(flow.transpose(0,3,1,2).copy()),
                             torch.from_numpy(mask.transpose(0,3,1,2).copy()))
print("upsample err:", np.abs(np.asarray(up_j) - up_t.numpy().transpose(0,2,3,1)).max())
