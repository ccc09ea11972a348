"""Standalone GIMMVFI parity debug: per-output error report."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np

import ref_compat

ref_compat.install_stubs()
import argparse

import torch

import src.models.generalizable_INR.gimmvfi_r as ref_mod
from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
from gimmvfi_tpu.utils.convert import convert_gimmvfi_r

ITERS = 4

ref_mod.initialize_RAFT = lambda: TorchRAFT(
    argparse.Namespace(small=False, mixed_precision=False, alternate_corr=False, dropout=0)
)
ref_mod.softsplat = ref_compat.patched_softsplat
torch.manual_seed(0)
ref = ref_mod.GIMMVFI_R(ref_compat.gimmvfi_config())
ref.eval()
inner_forward = ref.flow_estimator.forward
ref.flow_estimator.forward = lambda im0, im1, iters=20, return_feat=True: inner_forward(
    im0, im1, iters=ITERS, return_feat=return_feat
)

sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params, stats = convert_gimmvfi_r(sd)
model = GIMMVFI_R(raft_iters=ITERS)
variables = {"params": params, "batch_stats": stats}

rng = np.random.default_rng(0)
h = w = 128
base = rng.random((1, 2, h // 8, w // 8, 3)).astype(np.float32)
img = np.stack(
    [np.kron(base[:, i], np.ones((1, 8, 8, 1), np.float32)) for i in range(2)], axis=1
)

xs_t = torch.from_numpy(img.transpose(0, 4, 1, 2, 3).copy())
with torch.no_grad():
    coord = (ref.sample_coord_input(1, (h, w), [0.5], device=xs_t.device), None)
    tt = [torch.full((1,), 0.5).float()]
    ref_out = ref(xs_t, [coord], t=tt, ds_factor=None)

out = model.apply(variables, jnp.asarray(img), (0.5,), method=model.interpolate)


def report(name, mine, ref_nchw, chlast=True):
    r = ref_nchw.detach().numpy()
    if r.ndim == 3:
        r = r[None]
    if chlast:
        r = r.transpose(0, 2, 3, 1)
    m = np.asarray(mine)
    print(f"{name}: max={np.abs(m - r).max():.2e} mean={np.abs(m - r).mean():.2e}")


# raft flow
report("raft_f01", out["raft_flow"][:, 0], ref_out["raft_flow"][:, :, 0])
report("raft_f10", out["raft_flow"][:, 1], ref_out["raft_flow"][:, :, 1])
# normalized flows
r_nflow = ref_out["nflow"]  # (B, 2, 2, H, W) channels first, T second
print("ref nflow shape", r_nflow.shape)
report("nflow0", out["nflow"][:, 0], r_nflow[:, :, 0])
report("nflow1", out["nflow"][:, 1], r_nflow[:, :, 1])
# INR flow at t
report("ninrflow", out["ninrflow"][0][:, 0].transpose(0, 3, 1, 2), ref_out["ninrflow"][0][:, :, 0], chlast=False)
report("flowt", out["flowt"][0], ref_out["flowt"][0])
report("imgt", out["imgt_pred"][0], ref_out["imgt_pred"][0])
