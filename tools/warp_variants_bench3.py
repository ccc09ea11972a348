"""Round 3: lax.gather (2,2,C)-block-per-descriptor warp, fixed dnums.

Batch handled by flattening batch into the row axis (operand (n*(h+3), w3, c),
row index offset by image), so start_index_map=(0, 1) maps to (row, col).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gimmvfi_tpu.ops.interp import warp


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    try:
        float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    except Exception as e:
        print(f"{name:60s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:60s} {ms:8.2f} ms")
    return ms


def warp_block(img, flow):
    """lax.gather with slice_sizes (2, 2, C): one start per output pixel."""
    n, hh, ww, c = img.shape
    p = hh * ww
    jj = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
    x = (jj + flow[..., 0]).reshape(n, -1)
    y = (ii + flow[..., 1]).reshape(n, -1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]
    ix0 = x0f.astype(jnp.int32)
    iy0 = y0f.astype(jnp.int32)

    imgp = jnp.pad(img, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="edge")
    hp, wp = hh + 3, ww + 3
    op = imgp.reshape(n * hp, wp, c)
    py = jnp.clip(iy0, -1, hh) + 1 + jnp.arange(n, dtype=jnp.int32)[:, None] * hp
    px = jnp.clip(ix0, -1, ww) + 1
    starts = jnp.stack([py, px], axis=-1).reshape(n * p, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    v = jax.lax.gather(
        op, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (n*p, 2, 2, c)
    v = v.reshape(n, p, 2, 2, c)
    top = v[:, :, 0, 0] * (1 - wx) + v[:, :, 0, 1] * wx
    bot = v[:, :, 1, 0] * (1 - wx) + v[:, :, 1, 1] * wx
    return (top * (1 - wy) + bot * wy).reshape(n, hh, ww, c)


def main():
    h, w = 736, 1280
    p = h * w
    k = 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (k, h, w, 3), jnp.float32)
    flow = jax.random.normal(key, (k, h, w, 2), jnp.float32) * 8
    ref = jax.jit(warp)(img, flow)

    ms = timed(warp_block, img, flow, name="E2: (2,2,C)-block gather f32 3ch")
    if ms:
        got = jax.jit(warp_block)(img, flow)
        d = float(jnp.abs(ref - got).max())
        print(f"{'':60s} -> {ms / (k * p) * 1e6:.1f} ns/px, max diff {d:.2e}")

    imgb = img.astype(jnp.bfloat16)
    ms = timed(warp_block, imgb, flow, name="E2b: (2,2,C)-block gather bf16 3ch")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e6:.1f} ns/px")

    img67 = jax.random.normal(key, (1, h, w, 67), jnp.bfloat16)
    fl = jax.random.normal(key, (1, h, w, 2), jnp.float32) * 8
    ms = timed(warp_block, img67, fl, name="E2c: (2,2,67)-block gather bf16")
    if ms:
        print(f"{'':60s} -> {ms / p * 1e6:.1f} ns/px")

    # quarter-res case (InitDecoder): 184x320, 131ch bf16
    img131 = jax.random.normal(key, (1, h // 4, w // 4, 131), jnp.bfloat16)
    fl4 = jax.random.normal(key, (1, h // 4, w // 4, 2), jnp.float32) * 2
    ms = timed(warp_block, img131, fl4, name="E2d: (2,2,131)-block gather bf16 @1/4 res")
    if ms:
        print(f"{'':60s} -> {ms / (h * w // 16) * 1e6:.1f} ns/px")


if __name__ == "__main__":
    main()
