"""Microbench: the hot conv shapes of MultiFlowDecoder at 720p on the TPU.

Measures effective TFLOP/s for the exact convs that dominate decode_one
(3x3 256->256 bf16 at full 736x1280, plus the f_in->256 entry conv), the
elementwise PReLU pass, and the ResBlock slice/concat pattern. Tells us the
ceiling the synthesis stage can reach and whether XLA's conv choice or the
glue (concat/slice/activation traffic) is what holds MFU down.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import linen as nn


def timed(fn, *args, iters=5, name="", flops=None):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    tf = f" {flops / ms / 1e9:7.1f} TFLOP/s" if flops else ""
    print(f"{name:56s} {ms:8.2f} ms{tf}")
    return ms


def main():
    h, w = 736, 1280
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x256 = jax.random.normal(key, (1, h, w, 256), dt)
    k33 = jax.random.normal(key, (3, 3, 256, 256), dt)

    def conv33(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)

    fl = h * w * 256 * 256 * 9 * 2
    timed(conv33, x256, k33, name="3x3 conv 256->256 bf16 @736x1280", flops=fl)

    # space-to-batch variant: 8 row-tiles with 1px halo, batched
    def conv33_s2b(x, k):
        n, hh, ww, c = x.shape
        t = 8
        th = hh // t
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        tiles = jnp.stack(
            [xp[:, i * th : i * th + th + 2] for i in range(t)], 1
        ).reshape(n * t, th + 2, ww, c)
        y = jax.lax.conv_general_dilated(
            tiles, k, (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        return y.reshape(n, t * th, ww, c)

    timed(conv33_s2b, x256, k33, name="  same, 8 row-tiles batched (halo)", flops=fl)

    x180 = jax.random.normal(key, (1, h, w, 180), dt)
    k180 = jax.random.normal(key, (3, 3, 180, 256), dt)
    fl = h * w * 180 * 256 * 9 * 2
    timed(conv33, x180, k180, name="3x3 conv 180->256 bf16 (cb0)", flops=fl)

    x64 = jax.random.normal(key, (1, h, w, 64), dt)
    k64 = jax.random.normal(key, (3, 3, 64, 64), dt)
    fl = h * w * 64 * 64 * 9 * 2
    timed(conv33, x64, k64, name="3x3 conv 64->64 bf16 (side channel)", flops=fl)

    def prelu(x):
        alpha = jnp.full((x.shape[-1],), 0.25, x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)

    timed(prelu, x256, name="PReLU elementwise pass @256ch (HBM-bound)")

    def conv_prelu(x, k):
        return prelu(conv33(x, k))

    fl = h * w * 256 * 256 * 9 * 2
    timed(conv_prelu, x256, k33, name="3x3 conv + PReLU fused?", flops=fl)

    # the ResBlock glue: slice last 64, conv side, concat back
    k_side = jax.random.normal(key, (3, 3, 64, 64), dt)

    def resblock_glue(x, k, ks):
        side = conv33(x[..., -64:], ks)
        out = jnp.concatenate([x[..., :-64], side], -1)
        return conv33(out, k)

    fl = h * w * (64 * 64 + 256 * 256) * 9 * 2
    timed(resblock_glue, x256, k33, k_side,
          name="slice64 -> side conv -> concat -> 256 conv", flops=fl)

    # full ResBlock equivalent sequence (5 convs + 4 PReLU + residual)
    def resblock(x):
        out = prelu(conv33(x, k33))
        side = prelu(conv33(out[..., -64:], k_side))
        out = prelu(conv33(jnp.concatenate([out[..., :-64], side], -1), k33))
        side2 = prelu(conv33(out[..., -64:], k_side))
        out = conv33(jnp.concatenate([out[..., :-64], side2], -1), k33)
        return prelu(x + out)

    fl = h * w * (3 * 256 * 256 + 2 * 64 * 64) * 9 * 2
    timed(resblock, x256, name="full ResBlock(256,64) sequence", flops=fl)


if __name__ == "__main__":
    main()
