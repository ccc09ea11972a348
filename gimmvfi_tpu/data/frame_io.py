"""Frame and optical-flow file IO.

Rebuilds `src/utils/frame_utils.py`: Middlebury .flo read/write, PFM read,
KITTI 16-bit png flow, and a generic reader. Everything returns channels-last
numpy float32.
"""

from __future__ import annotations

import os
import re

import numpy as np

_TAG = np.float32(202021.25)


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> (H, W, 2) float32 (`frame_utils.py:24-43`)."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != _TAG:
            raise ValueError(f"invalid .flo magic in {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray):
    """(H, W, 2) float32 -> Middlebury .flo (`frame_utils.py:55-77`)."""
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([_TAG], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """PFM image -> float32 array (`frame_utils.py:46-100` behavior)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError("malformed PFM header")
        w, h = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape))


def read_kitti_png_flow(path: str) -> tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit png -> (flow (H,W,2), valid (H,W)) (`frame_utils.py:110-118`)."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    return (flow - 2**15) / 64.0, valid


def write_kitti_png_flow(path: str, flow: np.ndarray):
    """(H,W,2) flow -> KITTI 16-bit png (`frame_utils.py:131-135`)."""
    import cv2

    uv = 64.0 * flow + 2**15
    valid = np.ones((*flow.shape[:2], 1), np.float32)
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_image(path: str) -> np.ndarray:
    """PNG/JPEG -> (H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def read_gen(path: str):
    """Extension-dispatched reader (`frame_utils.py:137-152`)."""
    ext = os.path.splitext(path)[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return read_image(path)
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        return read_pfm(path).astype(np.float32)
    raise ValueError(f"unsupported extension: {ext}")
