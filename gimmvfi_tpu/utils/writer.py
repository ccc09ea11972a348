"""TensorBoard writers + reconstruction/flow image grids.

Rebuilds `src/utils/writer.py:16-55` (three writers: train / valid /
valid_ema) and the per-epoch visualization grids the trainers log
(`trainer_gimmvfi.py:361-421`, `trainer_gimm.py:201-286`): rows of
[I0 | pred | GT | I1 | flow_t->0 viz | flow_t->1 viz].

tensorboardX is available in this image; grids are also written as PNGs next
to the event files so runs are inspectable without TensorBoard.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import numpy as np

from .flow_viz import flow_to_image


class Writer:
    """Three-way TensorBoard writer ('train' | 'valid' | 'valid_ema')."""

    def __init__(self, result_path: str):
        from tensorboardX import SummaryWriter

        self.result_path = result_path
        self.writers = {
            mode: SummaryWriter(os.path.join(result_path, mode))
            for mode in ("train", "valid", "valid_ema")
        }

    def add_scalar(self, tag: str, value: float, mode: str, step: int):
        self.writers[mode].add_scalar(tag, float(value), step)

    def add_scalars(self, values: Mapping[str, float], mode: str, step: int):
        for tag, value in values.items():
            self.add_scalar(tag, value, mode, step)

    def add_image(self, tag: str, img_hwc: np.ndarray, mode: str, step: int):
        """img_hwc: (H, W, 3) float [0,1] or uint8."""
        img = np.asarray(img_hwc)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        self.writers[mode].add_image(tag, img, step, dataformats="HWC")
        png_dir = os.path.join(self.result_path, "grids")
        os.makedirs(png_dir, exist_ok=True)
        try:
            import cv2

            cv2.imwrite(
                os.path.join(png_dir, f"{mode}_{tag.replace('/', '_')}_{step}.png"),
                img[:, :, ::-1],
            )
        except Exception:
            pass

    def add_text(self, tag: str, text: str, mode: str, step: int):
        self.writers[mode].add_text(tag, text, step)

    def close(self):
        for w in self.writers.values():
            w.close()


class NullWriter:
    """No-op writer for non-zero hosts: the reference logs TB events on rank 0
    only (`utils/setup.py:25-44`); every other process gets this."""

    def add_scalar(self, *args, **kwargs):
        pass

    def add_scalars(self, *args, **kwargs):
        pass

    def add_image(self, *args, **kwargs):
        pass

    def add_text(self, *args, **kwargs):
        pass

    def close(self):
        pass


def reconstruction_grid(
    img0: np.ndarray,
    pred: np.ndarray,
    gt: np.ndarray,
    img1: np.ndarray,
    flow_t0: Optional[np.ndarray] = None,
    flow_t1: Optional[np.ndarray] = None,
    max_rows: int = 4,
) -> np.ndarray:
    """One row per sample: [I0 | pred | GT | I1 (| flow viz ...)]; all inputs
    (N, H, W, C) float [0,1] / flows in pixels (`trainer_gimmvfi.py:384-421`)."""
    n = min(max_rows, img0.shape[0])
    rows = []
    for i in range(n):
        cells = [img0[i], pred[i], gt[i], img1[i]]
        if flow_t0 is not None:
            cells.append(flow_to_image(np.asarray(flow_t0[i])) / 255.0)
        if flow_t1 is not None:
            cells.append(flow_to_image(np.asarray(flow_t1[i])) / 255.0)
        rows.append(np.concatenate([np.asarray(c, np.float32) for c in cells], axis=1))
    return np.concatenate(rows, axis=0)


def flow_grid(pred_nflow: np.ndarray, target_nflow: np.ndarray, max_rows: int = 4):
    """Stage-1 grid: [pred flow viz | target flow viz] per sample, inputs
    normalized flows in [0,1] (`trainer_gimm.py:201-286`)."""
    n = min(max_rows, pred_nflow.shape[0])
    rows = []
    for i in range(n):
        p = flow_to_image(np.asarray(pred_nflow[i] * 2.0 - 1.0)) / 255.0
        t = flow_to_image(np.asarray(target_nflow[i] * 2.0 - 1.0)) / 255.0
        rows.append(np.concatenate([p, t], axis=1))
    return np.concatenate(rows, axis=0)
