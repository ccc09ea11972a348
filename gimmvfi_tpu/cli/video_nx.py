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
    """Frames are RGB uint8. cv2 VideoWriter below 2048px; PNG + ffmpeg
    subprocess above (cv2's encoder rejects very large frames,
    `video_Nx.py:53-84`)."""
    h, w = frames[0].shape[:2]
    if max(h, w) > 2048:
        return _images_to_video_ffmpeg(frames, path, fps)
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(f[:, :, ::-1])
    writer.release()


def _images_to_video_ffmpeg(frames: list[np.ndarray], path: str, fps: int):
    """>2048px fallback: dump PNGs, encode with ffmpeg (`video_Nx.py:62-84`)."""
    import shutil
    import subprocess
    import tempfile

    import cv2

    tmp = tempfile.mkdtemp(prefix="gimmvfi_frames_")
    try:
        for i, f in enumerate(frames):
            cv2.imwrite(os.path.join(tmp, f"{i:06d}.png"), f[:, :, ::-1])
        cmd = [
            "ffmpeg", "-y", "-framerate", str(fps),
            "-i", os.path.join(tmp, "%06d.png"),
            "-c:v", "libx264", "-pix_fmt", "yuv420p", path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except FileNotFoundError:
            # no ffmpeg on PATH: keep the PNGs next to the target instead
            png_dir = path + ".frames"
            shutil.move(tmp, png_dir)
            print(f"ffmpeg unavailable; frames saved to {png_dir}")
            return
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def load_model(ckpt_path: str, model_type: str = "gimmvfi_r", flow_iters: int = None):
    """Build GIMM-VFI (R or F) and load a reference .pt or orbax checkpoint."""
    if model_type == "gimmvfi_f":
        from ..models.gimmvfi_f import GIMMVFI_F

        model = GIMMVFI_F(ff_iters=flow_iters or 32, remat=False)
    else:
        model = GIMMVFI_R(raft_iters=flow_iters or 20, remat=False)
    if ckpt_path.endswith((".pt", ".pth")):
        from ..utils.convert import (
            convert_gimmvfi_f,
            convert_gimmvfi_r,
            load_torch_state_dict,
        )

        convert = convert_gimmvfi_f if model_type == "gimmvfi_f" else convert_gimmvfi_r
        sd = load_torch_state_dict(ckpt_path)
        params, stats = convert(sd)
        variables = {"params": params, "batch_stats": stats}
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(os.path.abspath(ckpt_path))
    return model, variables


@functools.lru_cache(maxsize=4)
def _jitted_interpolate(model, ds):
    # cached per (model config, ds): one compile per (shape, len(ts)) combo.
    # ts is a traced array — changing N reuses the compile only if len(ts)
    # matches; the sequential scan keeps one timestep's memory live at a time.
    from ..models.gimmvfi_r import interpolate_sequential

    return jax.jit(
        lambda variables, xs, ts: interpolate_sequential(
            model, variables, xs, ts, ds
        )
    )


def interpolate_pair(model, variables, img0, img1, n, ds_factor, bucket=None):
    """One padded forward emitting N-1 timesteps (`video_Nx.py:163-181`).

    bucket: optional shape bucket (multiple of 32) — one compile per bucket
    when frame sizes vary."""
    padder = InputPadder(img0.shape, divisor=32, bucket=bucket)
    xs = jnp.stack(padder.pad(jnp.asarray(img0[None]), jnp.asarray(img1[None])), axis=1)
    ts = jnp.asarray([i / n for i in range(1, n)], jnp.float32)

    run = _jitted_interpolate(model, None if ds_factor in (None, 1.0) else ds_factor)
    out = run(variables, xs, ts)
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
    p.add_argument(
        "--model", default="gimmvfi_r", choices=["gimmvfi_r", "gimmvfi_f"]
    )
    p.add_argument(
        "--bucket",
        type=int,
        default=None,
        help="pad to multiples of this (>=32): one XLA compile per bucket "
        "when frame sizes vary",
    )
    args = p.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    model, variables = load_model(args.ckpt, args.model)

    img_list = sorted(os.listdir(args.source_path))
    images, flows_viz = [], []
    first = read_image(os.path.join(args.source_path, img_list[0]))
    first_u8 = (first * 255).astype(np.uint8)
    images.append(np.concatenate([first_u8, first_u8], axis=1))

    for j in range(len(img_list) - 1):
        i0 = read_image(os.path.join(args.source_path, img_list[j]))
        i1 = read_image(os.path.join(args.source_path, img_list[j + 1]))
        frames, flows = interpolate_pair(
            model, variables, i0, i1, args.N, args.ds_factor, bucket=args.bucket
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
