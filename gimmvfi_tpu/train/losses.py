"""Training losses: Laplacian pyramid L1, ternary census, Charbonnier.

Rebuilds `src/utils/loss.py` in NHWC JAX. LPIPS lives in train/lpips.py.
All functions are pure and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Plain numpy on purpose: a module-level jnp op would initialize the default
# JAX backend at import time, breaking late platform selection (e.g. the
# multichip dryrun pinning to CPU). Same trap as models/gimm_core.py.
_GAUSS5 = (
    np.array(
        [
            [1.0, 4.0, 6.0, 4.0, 1.0],
            [4.0, 16.0, 24.0, 16.0, 4.0],
            [6.0, 24.0, 36.0, 24.0, 6.0],
            [4.0, 16.0, 24.0, 16.0, 4.0],
            [1.0, 4.0, 6.0, 4.0, 1.0],
        ],
        dtype=np.float32,
    )
    / 256.0
)


def _conv_gauss(img: Array, scale: float = 1.0) -> Array:
    """Depthwise 5x5 gaussian with reflect padding (`loss.py:60-63`)."""
    c = img.shape[-1]
    k = jnp.broadcast_to((_GAUSS5 * scale)[:, :, None, None], (5, 5, 1, c))
    xp = jnp.pad(img, [(0, 0), (2, 2), (2, 2), (0, 0)], mode="reflect")
    return jax.lax.conv_general_dilated(
        xp,
        k,
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _lap_upsample(x: Array) -> Array:
    """Zero-interleave 2x upsample + 4x gaussian (`loss.py:42-57`)."""
    n, h, w, c = x.shape
    up = jnp.zeros((n, h * 2, w * 2, c), x.dtype)
    up = up.at[:, ::2, ::2].set(x)
    return _conv_gauss(up, scale=4.0)


def laplacian_pyramid(img: Array, max_levels: int) -> list[Array]:
    pyr = []
    current = img
    for _ in range(max_levels):
        filtered = _conv_gauss(current)
        down = filtered[:, ::2, ::2]
        # odd level sizes: the 2x upsample overshoots by one row/col — crop
        # (the reference's training recipes only ever see even sizes)
        up = _lap_upsample(down)[:, : current.shape[1], : current.shape[2]]
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(pred: Array, target: Array, max_levels: int = 5) -> Array:
    """5-level Laplacian pyramid L1 (`loss.py:79-94`)."""
    pa = laplacian_pyramid(pred, max_levels)
    pb = laplacian_pyramid(target, max_levels)
    return sum(jnp.abs(a - b).mean() for a, b in zip(pa, pb))


def _census_transform(x: Array, patch_size: int = 7) -> Array:
    """7x7 patch descriptor of the grayscale image (`loss.py:105-110`)."""
    gray = x.mean(axis=-1, keepdims=True)
    p = patch_size // 2
    gp = jnp.pad(gray, [(0, 0), (p, p), (p, p), (0, 0)])
    h, w = gray.shape[1:3]
    patches = jnp.concatenate(
        [
            gp[:, dy : dy + h, dx : dx + w]
            for dy in range(patch_size)
            for dx in range(patch_size)
        ],
        axis=-1,
    )
    loc_diff = patches - gray
    return loc_diff / jnp.sqrt(0.81 + loc_diff**2)


def census_loss(pred: Array, target: Array, patch_size: int = 7) -> Array:
    """Ternary census loss (`loss.py:97-127`)."""
    dx = _census_transform(pred, patch_size)
    dy = jax.lax.stop_gradient(_census_transform(target, patch_size))
    diff = dx - dy
    dist = (diff**2 / (0.1 + diff**2)).mean(axis=-1, keepdims=True)

    p = patch_size // 2
    n, h, w, _ = pred.shape
    mask = jnp.zeros((1, h, w, 1), pred.dtype)
    mask = mask.at[:, p : h - p, p : w - p].set(1.0)
    return (dist * mask).mean()


def charbonnier_l1(pred: Array, target: Array, mask: Array | None = None) -> Array:
    """Charbonnier L1 (`loss.py:130-140`)."""
    diff = pred - target
    val = jnp.sqrt(diff**2 + 1e-6)
    if mask is None:
        return val.mean()
    return (val * mask).mean() / (mask.mean() + 1e-9)


def charbonnier_ada(diff: Array, weight: Array) -> Array:
    """Adaptive Charbonnier (`loss.py:143-151`; unused by released recipes)."""
    alpha = weight / 2.0
    epsilon = 10.0 ** (-(10.0 * weight - 1.0) / 3.0)
    return ((diff**2 + epsilon**2) ** alpha).mean()


def psnr(pred: Array, target: Array, reduction: str = "mean") -> Array:
    """Per-sample PSNR (`gimmvfi_r.py:412-426`)."""
    n = pred.shape[0]
    mse = ((pred - target) ** 2).reshape(n, -1).mean(axis=-1)
    val = -10.0 * jnp.log10(mse)
    if reduction == "mean":
        return val.mean()
    if reduction == "sum":
        return val.sum()
    return val
