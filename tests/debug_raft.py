"""Standalone layer-by-layer RAFT parity debug (not a pytest test)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import ref_compat

ref_compat.install_stubs()
import argparse

import torch

from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

import jax.numpy as jnp

from gimmvfi_tpu.flow.raft import RAFT, BasicEncoder
from gimmvfi_tpu.utils.convert import convert_raft

rng = np.random.default_rng(0)
args = argparse.Namespace(small=False, mixed_precision=False, alternate_corr=False, dropout=0)
torch.manual_seed(0)
ref = TorchRAFT(args)
ref.eval()

sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params, stats = convert_raft(sd)

h, w = 128, 128
img1 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
img2 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2).copy())
t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2).copy())


def cmp(name, mine, ref_t):
    ref_np = ref_t.detach().numpy().transpose(0, 2, 3, 1)
    mine = np.asarray(mine)
    err = np.abs(mine - ref_np).max()
    print(f"{name}: max_err={err:.2e} shapes {mine.shape} {ref_np.shape}")
    return err


with torch.no_grad():
    n1 = 2 * (t1 / 255.0) - 1.0
    n2 = 2 * (t2 / 255.0) - 1.0
    fmap1_ref, fmap2_ref = ref.fnet([n1, n2])
    cnet_ref, feats_ref = ref.cnet(n1, return_feature=True)

# my fnet alone
fnet = BasicEncoder(256, "instance")
fv = {"params": params["fnet"]}
jn1 = jnp.asarray((2 * (img1 / 255.0) - 1.0).astype(np.float32))
jn2 = jnp.asarray((2 * (img2 / 255.0) - 1.0).astype(np.float32))
both = fnet.apply(fv, jnp.concatenate([jn1, jn2], 0))
cmp("fmap1", both[:1], fmap1_ref)
cmp("fmap2", both[1:], fmap2_ref)

cnet = BasicEncoder(256, "batch")
cv = {"params": params["cnet"], "batch_stats": stats["cnet"]}
cnet_out, feats = cnet.apply(cv, jn1, return_feature=True)
cmp("cnet", cnet_out, cnet_ref)
for i in range(3):
    cmp(f"feat{i}", feats[i], feats_ref[i])

# full forward, small iters
with torch.no_grad():
    flow_ref, f_ref, fm_ref = ref(t1, t2, iters=3, return_feat=True)
model = RAFT(iters=3)
flow, feats2, fmap1 = model.apply(
    {"params": params, "batch_stats": stats}, jnp.asarray(img1), jnp.asarray(img2)
)
cmp("fmap1_full", fmap1, fm_ref)
cmp("feats[0]", feats2[0], f_ref[0])
cmp("feats[1]", feats2[1], f_ref[1])
cmp("flow", flow, flow_ref)
print("done")

# --- one-iteration probe
model1 = RAFT(iters=1)
flow1, _, _ = model1.apply(
    {"params": params, "batch_stats": stats}, jnp.asarray(img1), jnp.asarray(img2)
)
with torch.no_grad():
    flow1_ref, _, _ = ref(t1, t2, iters=1, return_feat=True)
cmp("flow_iter1", flow1, flow1_ref)
print("mine nan count:", int(np.isnan(np.asarray(flow1)).sum()))

print("ref nan count:", int(np.isnan(flow1_ref.numpy()).sum()), int(np.isnan(flow_ref.numpy()).sum()))
fr = flow1_ref.numpy().transpose(0,2,3,1); mn = np.asarray(flow1)
m = ~np.isnan(fr)
print("masked max err:", np.abs(mn[m[...,:]]-fr[m]).max() if m.any() else "allnan", "nan frac:", 1-m.mean())

# --- torch-side probe of first iteration
from src.models.generalizable_INR.raft.corr import CorrBlock
from src.models.generalizable_INR.raft.utils.utils import coords_grid as t_coords_grid
with torch.no_grad():
    corr_fn = CorrBlock(fmap1_ref, fmap2_ref, radius=4)
    c0 = t_coords_grid(1, 8, 12, device=fmap1_ref.device)
    corr_t = corr_fn(c0)
    print("torch corr nan:", int(torch.isnan(corr_t).sum()), corr_t.shape)
    net_t = torch.tanh(cnet_ref[:, :128]); inp_t = torch.relu(cnet_ref[:, 128:])
    net2, upm, dflow = ref.update_block(net_t, inp_t, corr_t, c0 - c0)
    print("dflow nan:", int(torch.isnan(dflow).sum()), "net2 nan:", int(torch.isnan(net2).sum()), "upm nan:", int(torch.isnan(upm).sum()))
