"""Small NHWC neural layers with torch-compatible semantics.

These are the building blocks the reference composes out of
torch.nn (Conv2d/PReLU/BatchNorm2d/InstanceNorm2d/PixelShuffle, plus the
SIREN activations in `modules/layers.py`). Everything is flax.linen in
channels-last layout; checkpoint converters (utils/convert.py) map torch
OIHW weights onto these parameter trees.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent (NHWC, HWIO kernel).

    padding: int or (ph, pw); pad_mode "zeros" | "reflect" | "replicate".
    `dtype` is the flax computation dtype: params stay float32, inputs and
    kernel are cast to `dtype` for the conv (bfloat16 = MXU-native mixed
    precision). None keeps full input/param promotion (float32).
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        if self.pad_mode != "zeros" and (ph or pw):
            mode = {"reflect": "reflect", "replicate": "edge"}[self.pad_mode]
            x = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)], mode=mode)
            pad = "VALID"
        else:
            pad = [(ph, ph), (pw, pw)]
        in_feat = x.shape[-1]
        fan_in = kh * kw * (in_feat // self.groups)
        return nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=pad,
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            ),
            bias_init=torch_conv_bias_init(fan_in),
            name="conv",
        )(x)


class PReLU(nn.Module):
    """torch.nn.PReLU(num_parameters=C): per-channel learnable slope."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (self.channels,)
        )
        # keep the activation in the input's compute dtype (no f32 promotion)
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


def leaky_relu(x: Array, negative_slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d default (affine=False, biased var, per-sample).

    Statistics are always computed in float32 (bf16 variance suffers
    catastrophic cancellation); the result returns in the input dtype.
    """
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class BatchNorm(nn.Module):
    """torch BatchNorm2d equivalent (affine, running stats).

    `use_running_average=True` for eval / frozen inference.
    torch momentum 0.1 == flax momentum 0.9.
    """

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=self.epsilon,
            use_bias=True,
            use_scale=True,
            name="bn",
        )(x)


def pixel_shuffle(x: Array, upscale: int) -> Array:
    """torch.nn.PixelShuffle equivalent in NHWC.

    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]  — channel blocks
    become spatial, preserving torch's channel ordering so converted conv
    weights line up.
    """
    n, h, w, c = x.shape
    r = upscale
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, oc
    return x.reshape(n, h * r, w * r, oc)


def sine(x: Array, w0: float = 1.0) -> Array:
    """SIREN activation (`modules/layers.py:13-25`)."""
    return jnp.sin(w0 * x)


def damping(x: Array, w0: float = 1.0) -> Array:
    """Sublinear sine from arXiv:2306.15242 (`modules/layers.py:28-42`)."""
    x = jnp.clip(x, 1e-30, None)
    return jnp.sin(w0 * x) * jnp.sqrt(jnp.abs(x))
