"""Nx video interpolation demo (reference `src/video_Nx.py`).

Reads a directory of frames, interpolates N-1 arbitrary timesteps between
each adjacent pair with GIMM-VFI, writes an output mp4 (original || interp
side by side) plus a flow-visualization mp4.

Usage:
  python -m gimmvfi_tpu.cli.video_nx --source-path demo/input_frames \
      --output-path out --N 9 --ds-factor 1.0 --ckpt gimmvfi_r_arb_lpips.pt
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.frame_io import read_image
from ..models.gimmvfi_r import GIMMVFI_R
from ..ops.pad import InputPadder
from ..utils.flow_viz import flow_to_image


def images_to_video(frames: list[np.ndarray], path: str, fps: int = 30):
    """cv2 VideoWriter path; frames are RGB uint8 (`video_Nx.py:53-84`)."""
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(f[:, :, ::-1])
    writer.release()


def load_model(ckpt_path: str, raft_iters: int = 20):
    """Build GIMMVFI_R and load a reference .pt or orbax checkpoint."""
    model = GIMMVFI_R(raft_iters=raft_iters)
    if ckpt_path.endswith((".pt", ".pth")):
        from ..utils.convert import convert_gimmvfi_r, load_torch_state_dict

        sd = load_torch_state_dict(ckpt_path)
        params, stats = convert_gimmvfi_r(sd)
        variables = {"params": params, "batch_stats": stats}
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(os.path.abspath(ckpt_path))
    return model, variables


@functools.lru_cache(maxsize=4)
def _jitted_interpolate(model):
    # cached per model config: one compile per (shape, ts, ds) combination
    return jax.jit(
        lambda variables, xs, ts, ds: model.apply(
            variables, xs, ts, ds, method=model.interpolate
        ),
        static_argnums=(2, 3),
    )


def interpolate_pair(model, variables, img0, img1, n, ds_factor):
    """One padded forward emitting N-1 timesteps (`video_Nx.py:163-181`)."""
    padder = InputPadder(img0.shape, divisor=32)
    xs = jnp.stack(padder.pad(jnp.asarray(img0[None]), jnp.asarray(img1[None])), axis=1)
    ts = tuple(i / n for i in range(1, n))

    run = _jitted_interpolate(model)
    out = run(variables, xs, ts, None if ds_factor in (None, 1.0) else ds_factor)
    frames = [np.asarray(padder.unpad(f))[0] for f in out["imgt_pred"]]
    flows = [np.asarray(padder.unpad(f))[0] for f in out["flowt"]]
    return frames, flows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source-path", required=True)
    p.add_argument("--output-path", required=True)
    p.add_argument("--N", type=int, default=8)
    p.add_argument("--ds-factor", type=float, default=1.0)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    model, variables = load_model(args.ckpt)

    img_list = sorted(os.listdir(args.source_path))
    images, flows_viz = [], []
    first = read_image(os.path.join(args.source_path, img_list[0]))
    first_u8 = (first * 255).astype(np.uint8)
    images.append(np.concatenate([first_u8, first_u8], axis=1))

    for j in range(len(img_list) - 1):
        i0 = read_image(os.path.join(args.source_path, img_list[j]))
        i1 = read_image(os.path.join(args.source_path, img_list[j + 1]))
        frames, flows = interpolate_pair(
            model, variables, i0, i1, args.N, args.ds_factor
        )
        hold = (i1 * 255).astype(np.uint8)
        for f, fl in zip(frames, flows):
            pred = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            images.append(np.concatenate([hold, pred], axis=1))
            flows_viz.append(flow_to_image(fl))
        images.append(np.concatenate([hold, hold], axis=1))

    images_to_video(images, os.path.join(args.output_path, "output.mp4"), args.fps)
    if flows_viz:
        images_to_video(flows_viz, os.path.join(args.output_path, "flow.mp4"), args.fps)
    print(f"wrote {len(images)} frames to {args.output_path}")


if __name__ == "__main__":
    main()
