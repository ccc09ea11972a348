"""Round 2 of warp variant hunting: beat the 12-lane quad's 26 ns/px.

Fast path found so far: take_along_axis with <=8-lane rows ~= 9.7 ns/px.
Candidates here:
  E: lax.gather slice_sizes=(1,2,2,C) on the spatial operand (one descriptor
     per pixel fetching the whole 2x2xC block, if XLA emits one descriptor)
  F: two 6-lane pair-row gathers (corners 00|01 and 10|11) + lerp
  G: variant F with bf16 payload
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
        print(f"{name:60s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:60s} {ms:8.2f} ms")
    return ms


def _coords(img, flow):
    n, hh, ww, _ = img.shape
    jj = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
    x = (jj + flow[..., 0]).reshape(n, -1)
    y = (ii + flow[..., 1]).reshape(n, -1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    return x0f.astype(jnp.int32), y0f.astype(jnp.int32), x - x0f, y - y0f


def warp_gather2x2(img, flow):
    """One lax.gather fetching a (2, 2, C) block per output pixel."""
    n, hh, ww, c = img.shape
    p = hh * ww
    ix0, iy0, wx, wy = _coords(img, flow)
    imgp = jnp.pad(img, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="edge")
    py = (jnp.clip(iy0, -1, hh) + 1).astype(jnp.int32)
    px = (jnp.clip(ix0, -1, ww) + 1).astype(jnp.int32)
    starts = jnp.stack([py, px], axis=-1)  # (n, p, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    v = jax.lax.gather(
        imgp,
        starts,
        dnums,
        slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (n, p, 2, 2, c)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v[:, :, 0, 0] * (1 - wx) + v[:, :, 0, 1] * wx
    bot = v[:, :, 1, 0] * (1 - wx) + v[:, :, 1, 1] * wx
    return (top * (1 - wy) + bot * wy).reshape(n, hh, ww, c)


def warp_pairrows(img, flow):
    """Two take_along_axis of 2C-lane rows (horizontal corner pairs)."""
    n, hh, ww, c = img.shape
    p = hh * ww
    ix0, iy0, wx, wy = _coords(img, flow)
    imgp = jnp.pad(img, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="edge")
    w3 = ww + 3
    flat = imgp.reshape(n, (hh + 3) * w3, c)
    m = (hh + 1) * w3 + ww + 2
    pair = jnp.concatenate([flat[:, :m], flat[:, 1 : m + 1]], axis=-1)  # (n, m, 2c)
    py = jnp.clip(iy0, -1, hh) + 1
    px = jnp.clip(ix0, -1, ww) + 1
    base = py * w3 + px
    top = jnp.take_along_axis(pair, base[..., None], axis=1)  # (n, p, 2c)
    bot = jnp.take_along_axis(pair, (base + w3)[..., None], axis=1)
    wx = wx[..., None]
    wy = wy[..., None]
    t = top[..., :c] * (1 - wx) + top[..., c:] * wx
    b = bot[..., :c] * (1 - wx) + bot[..., c:] * wx
    return (t * (1 - wy) + b * wy).reshape(n, hh, ww, c)


def main():
    h, w = 736, 1280
    p = h * w
    k = 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (k, h, w, 3), jnp.float32)
    flow = jax.random.normal(key, (k, h, w, 2), jnp.float32) * 8

    ref = jax.jit(warp)(img, flow)

    for fn, name in (
        (warp_gather2x2, "E: lax.gather (2,2,C) block per px"),
        (warp_pairrows, "F: two 6-lane pair-row takes"),
    ):
        ms = timed(fn, img, flow, name=name)
        if ms:
            got = jax.jit(fn)(img, flow)
            d = float(jnp.abs(ref - got).max())
            print(f"{'':60s} -> {ms / (k * p) * 1e6:.1f} ns/px, max diff {d:.2e}")

    imgb = img.astype(jnp.bfloat16)

    def warp_pair_bf16(i, f):
        return warp_pairrows(i, f)

    ms = timed(warp_pair_bf16, imgb, flow, name="G: pair-rows, bf16 payload")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e6:.1f} ns/px")

    # H: 67-channel pair-rows (the MultiFlowDecoder case)
    img67 = jax.random.normal(key, (1, h, w, 67), jnp.bfloat16)
    fl = jax.random.normal(key, (1, h, w, 2), jnp.float32) * 8
    ms = timed(warp_pairrows, img67, fl, name="H: pair-rows 67ch bf16 (134-lane rows)")
    if ms:
        print(f"{'':60s} -> {ms / p * 1e6:.1f} ns/px")
    ms = timed(warp, img67, fl, name="H0: current warp 67ch bf16")
    if ms:
        print(f"{'':60s} -> {ms / p * 1e6:.1f} ns/px")


if __name__ == "__main__":
    main()
