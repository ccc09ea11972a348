"""Recorded PSNR parity: our GIMM-VFI-R vs the torch reference, demo frames.

The released checkpoints are unreachable from this box (zero egress), so
this uses fixed-seed (torch.manual_seed(0)) reference weights — the weight
DISTRIBUTION is the released architecture's init and the inputs are the
repo's real demo frames, so the number measures implementation parity on
real content, end to end (RAFT 20 iters, GIMM INR, AMT synthesis, t=0.5).

Outputs a dB figure: PSNR between the reference's prediction and ours.
Anything above ~50 dB means any benchmark PSNR delta is <= 0.05 dB
(BASELINE.json target), since the two predictions are visually identical.

Run: cd tests && PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python ../tools/golden_parity.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

RAFT_ITERS = 20


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x448", help="HxW (demo frames are 480x856)")
    p.add_argument("--iters", type=int, default=RAFT_ITERS)
    args = p.parse_args()
    h, w = (int(x) for x in args.size.split("x"))

    import cv2
    import torch

    import ref_compat

    ref_compat.install_stubs()
    import argparse as ap

    import src.models.generalizable_INR.gimmvfi_r as ref_mod
    from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

    def fake_initialize_raft():
        a = ap.Namespace(
            small=False, mixed_precision=False, alternate_corr=False, dropout=0
        )
        return TorchRAFT(a)

    ref_mod.initialize_RAFT = fake_initialize_raft
    ref_mod.softsplat = ref_compat.patched_softsplat

    torch.manual_seed(0)
    ref_model = ref_mod.GIMMVFI_R(ref_compat.gimmvfi_config())
    ref_model.eval()
    inner = ref_model.flow_estimator.forward
    ref_model.flow_estimator.forward = (
        lambda i0, i1, iters=20, return_feat=True: inner(
            i0, i1, iters=args.iters, return_feat=return_feat
        )
    )

    # real demo content
    frames = sorted(os.listdir("/root/reference/demo/input_frames"))[:2]
    imgs = []
    for f in frames:
        img = cv2.imread(os.path.join("/root/reference/demo/input_frames", f))
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        imgs.append(img[:, :, ::-1].astype(np.float32) / 255.0)
    i0, i1 = imgs

    # ---- reference forward at t=0.5 (reference tensor layout NCHW)
    t0 = torch.from_numpy(i0.transpose(2, 0, 1).copy())[None]
    t1 = torch.from_numpy(i1.transpose(2, 0, 1).copy())[None]
    xs = torch.stack([t0, t1], dim=2)  # (1, C, 2, H, W)
    coord = ref_model.sample_coord_input(
        1, (h, w), [0.5], device=torch.device("cpu")
    )
    with torch.no_grad():
        out = ref_model(xs, [(coord, None)], [torch.tensor([0.5])])
    ref_pred = out["imgt_pred"][0][0].numpy().transpose(1, 2, 0)

    # ---- ours, from the converted state_dict
    import jax
    import jax.numpy as jnp

    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
    from gimmvfi_tpu.utils.convert import convert_gimmvfi_r

    params, stats = convert_gimmvfi_r(
        {k: v for k, v in ref_model.state_dict().items()}
    )
    variables = {"params": params, "batch_stats": stats}
    model = GIMMVFI_R(raft_iters=args.iters)
    img_xs = jnp.asarray(np.stack([i0, i1])[None])  # (1, 2, H, W, 3)
    ours = jax.jit(
        lambda v, x: model.apply(v, x, (0.5,), method=model.interpolate)[
            "imgt_pred"
        ][0]
    )(variables, img_xs)
    our_pred = np.asarray(ours)[0]

    mse = float(((ref_pred - our_pred) ** 2).mean())
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    print(f"size {h}x{w}, {args.iters} RAFT iters, t=0.5")
    print(f"PSNR(ours vs torch reference) = {psnr:.2f} dB  (mse {mse:.3e})")
    print(f"ref pred range [{ref_pred.min():.4f}, {ref_pred.max():.4f}]")
    return psnr


if __name__ == "__main__":
    main()
