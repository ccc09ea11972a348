"""Round 4: packed-quad warp — bf16 corner pairs bitcast into f32 lanes.

For C<=4 bf16 payloads the whole 4-corner row is 4C bf16 = 2C f32 lanes
(<= 8), which rides take_along_axis's fast descriptor path (~10 ns/row).
Bitcast is exact: the gathered bits are the same bf16 values.
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


def warp_packed(img, flow):
    """Packed-quad warp for bf16 img, any C with 4C even (always)."""
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
    w3 = ww + 3
    flat = imgp.reshape(n, (hh + 3) * w3, c)
    m = (hh + 1) * w3 + ww + 2
    quad = jnp.concatenate(
        [
            flat[:, :m],
            flat[:, 1 : m + 1],
            flat[:, w3 : w3 + m],
            flat[:, w3 + 1 : w3 + 1 + m],
        ],
        axis=-1,
    )  # (n, m, 4c) bf16
    packed = jax.lax.bitcast_convert_type(
        quad.reshape(n, m, 2 * c, 2), jnp.float32
    )  # (n, m, 2c) f32
    py = jnp.clip(iy0, -1, hh) + 1
    px = jnp.clip(ix0, -1, ww) + 1
    base = py * w3 + px
    got = jnp.take_along_axis(packed, base[..., None], axis=1)  # (n, p, 2c)
    v = jax.lax.bitcast_convert_type(got, jnp.bfloat16).reshape(n, p, 4, c)
    top = v[:, :, 0] * (1 - wx.astype(img.dtype)) + v[:, :, 1] * wx.astype(img.dtype)
    bot = v[:, :, 2] * (1 - wx.astype(img.dtype)) + v[:, :, 3] * wx.astype(img.dtype)
    out = top * (1 - wy.astype(img.dtype)) + bot * wy.astype(img.dtype)
    return out.reshape(n, hh, ww, c)


def main():
    h, w = 736, 1280
    p = h * w
    k = 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (k, h, w, 3), jnp.bfloat16)
    flow = jax.random.normal(key, (k, h, w, 2), jnp.float32) * 8
    ref = jax.jit(warp)(img, flow)

    ms = timed(warp_packed, img, flow, name="P: packed-quad bf16 3ch (6 f32 lanes)")
    if ms:
        got = jax.jit(warp_packed)(img, flow)
        d = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
        print(f"{'':60s} -> {ms / (k * p) * 1e6:.1f} ns/px, max diff {d:.2e}")

    # 67ch bf16: packed = 134 f32 lanes -> splits? measure anyway
    img67 = jax.random.normal(key, (1, h, w, 67), jnp.bfloat16)
    fl = jax.random.normal(key, (1, h, w, 2), jnp.float32) * 8
    ms = timed(warp_packed, img67, fl, name="P67: packed-quad bf16 67ch (134 f32 lanes)")
    if ms:
        print(f"{'':60s} -> {ms / p * 1e6:.1f} ns/px")

    # 6-warp combine load, packed
    def six(i, f):
        return warp_packed(i, f) + warp_packed(i, f + 1.0)

    ms = timed(six, img, flow, name="P6: 6 packed warps (combine load)")
    if ms:
        print(f"{'':60s} -> {ms / (6 * p) * 1e6:.1f} ns/px")


if __name__ == "__main__":
    main()
