"""Shared GIMM machinery: motion encoder, latent refiner, splatting weights.

Rebuilds the pieces `gimm.py` and `gimmvfi_r.py` duplicate
(`gimm.py:36-127` == `gimmvfi_r.py:84-111,444-492`): the flow->latent CNN
encoder, the splat-fusion residual refiner, and the variance +
warp-consistency splatting-weight metric.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import Conv2d, leaky_relu
from ..ops.interp import warp
from ..ops.softsplat import softsplat
from .synthesis import LateralBlock

Array = jax.Array

# plain numpy: a module-level jnp array would initialize a JAX backend at
# import time (breaking late platform selection, e.g. the multichip dryrun)
_GAUSS3 = np.array(
    [
        [1.0 / 16.0, 1.0 / 8.0, 1.0 / 16.0],
        [1.0 / 8.0, 1.0 / 4.0, 1.0 / 8.0],
        [1.0 / 16.0, 1.0 / 8.0, 1.0 / 16.0],
    ],
    dtype=np.float32,
)


def gaussian_blur3x3(x: Array) -> Array:
    """Depthwise 3x3 gaussian with reflect padding (the reference's fixed
    `g_filter` conv3d, `gimm.py:64-73,84-95`)."""
    c = x.shape[-1]
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    k = jnp.broadcast_to(jnp.asarray(_GAUSS3)[:, :, None, None], (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        xp,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class MotionEncoder(nn.Module):
    """`cnn_encoder`: 2-channel flow -> 16-channel latent (`gimm.py:38-49`)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        x = Conv2d(16, 3, 1, 1, dtype=dt, name="conv0")(x)
        x = Conv2d(32, 3, 1, 1, dtype=dt, name="conv1")(x)
        x = leaky_relu(x, 0.1)
        x = LateralBlock(32, dtype=dt, name="lateral3")(x)
        x = LateralBlock(32, dtype=dt, name="lateral4")(x)
        x = LateralBlock(32, dtype=dt, name="lateral5")(x)
        x = leaky_relu(x, 0.1)
        return Conv2d(16, 3, 1, 1, pad_mode="reflect", dtype=dt, name="conv7")(x)


class LatentRefiner(nn.Module):
    """`res_conv`: fuse splatted latents with a residual (`gimm.py:54-63`)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        x = Conv2d(32, 3, 1, 1, dtype=dt, name="conv0")(x)
        x = Conv2d(64, 3, 1, 1, dtype=dt, name="conv1")(x)
        x = leaky_relu(x, 0.1)
        x = LateralBlock(64, dtype=dt, name="lateral3")(x)
        x = leaky_relu(x, 0.1)
        return Conv2d(32, 3, 1, 1, pad_mode="reflect", dtype=dt, name="conv5")(x)


def splatting_weights(
    flow01: Array, flow10: Array, alpha_v: Array, alpha_fe: Array
) -> tuple[Array, Array]:
    """Importance metric for forward splatting (`gimm.py:79-127`).

    Combines local flow variance (3x3 gaussian E[x^2]-E[x]^2) with
    forward/backward warp-consistency error; learnable alphas scale each term.
    flow01/flow10: (N, H, W, 2) raw flows. Returns two (N, H, W, 1) weights.
    """
    flows = jnp.concatenate([flow01, flow10], axis=0)
    blurred = gaussian_blur3x3(jnp.concatenate([flows**2, flows], axis=-1))
    sq_mean, mean = blurred[..., :2], blurred[..., 2:]
    var = jnp.sqrt(jnp.clip(sq_mean - mean**2, 1e-9, None)).mean(-1, keepdims=True)
    n = flow01.shape[0]
    var01, var10 = var[:n], var[n:]

    f01_warp = -warp(flow10, flow01)
    f10_warp = -warp(flow01, flow10)
    err01 = jnp.abs(f01_warp - flow01).mean(-1, keepdims=True)
    err10 = jnp.abs(f10_warp - flow10).mean(-1, keepdims=True)

    w1 = 1.0 / (1.0 + err01 * alpha_fe) + 1.0 / (1.0 + var01 * alpha_v)
    w2 = 1.0 / (1.0 + err10 * alpha_fe) + 1.0 / (1.0 + var10 * alpha_v)
    return w1, w2


def splat_fuse_latents(
    refiner,
    latent0: Array,
    latent1: Array,
    flow01: Array,
    flow10: Array,
    w1: Array,
    w2: Array,
    t: Array,
    fwarp_type: str = "linear",
) -> Array:
    """Forward-splat both latents to time t and fuse (`gimm.py:148-168`).

    t: (N,) per-sample timestep. Returns (N, H, W, 32) latent at time t.
    """
    t = t.reshape(-1, 1, 1, 1)
    mode = fwarp_type + "-zeroeps"
    # two separate splat calls, NOT one batched 2N call: the sorted-window
    # kernel's sort and its sequential window grid both scale with the total
    # destination space, and the batched variant measured 15% slower
    # end-to-end at 720p (2.30 vs 2.72 fps, round-5 bisect) — the two
    # independent sorts/grids pipeline better than one twice-as-long one
    s0 = softsplat(latent0, flow01 * t, w1, mode)
    s1 = softsplat(latent1, flow10 * (1.0 - t), w2, mode)
    fused = jnp.concatenate([s0, s1], axis=-1)
    return fused + refiner(jnp.concatenate([latent0, latent1, fused], axis=-1))
