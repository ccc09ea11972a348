"""Microbench XLA warp variants at 720p: chase ~10 ns/descriptor.

The production quad-gather warp measures ~26 ns/output-pixel; a bare
take_along_axis of 8-lane rows measures ~10.8 ns/row. This bench isolates
what the warp path adds (batch dim, 12-lane rows, weight einsum, pad copy)
and tests variants to close the gap.
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


def main():
    h, w = 736, 1280
    p = h * w
    k = 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (k, h, w, 3), jnp.float32)
    flow = jax.random.normal(key, (k, h, w, 2), jnp.float32) * 8

    ms = timed(warp, img, flow, name="current warp (batch 3, 3ch)")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e9:.1f} ns/px")

    # variant A: flat batch — single take over batch-offset indices
    def warp_flat(img, flow):
        n, hh, ww, c = img.shape
        jj = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
        ii = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
        x = (jj + flow[..., 0]).reshape(n, -1)
        y = (ii + flow[..., 1]).reshape(n, -1)
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        ix0 = x0f.astype(jnp.int32)
        iy0 = y0f.astype(jnp.int32)

        imgp = jnp.pad(img, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="edge")
        w3 = ww + 3
        flat = imgp.reshape(n * (hh + 3) * w3, c)
        m = (hh + 1) * w3 + ww + 2
        quad = jnp.concatenate(
            [
                flat[: n * (hh + 3) * w3 - w3 - 1],
                flat[1 : n * (hh + 3) * w3 - w3],
                flat[w3 : n * (hh + 3) * w3 - 1],
                flat[w3 + 1 :],
            ],
            axis=-1,
        )
        py = jnp.clip(iy0, -1, hh) + 1
        px = jnp.clip(ix0, -1, ww) + 1
        base = (
            py * w3
            + px
            + (jnp.arange(n, dtype=jnp.int32) * ((hh + 3) * w3))[:, None]
        ).reshape(-1)
        vals = jnp.take(quad, base, axis=0)  # (n*p, 4c)
        vals = vals.reshape(n, p, 4, c)
        w00 = ((1 - wx) * (1 - wy))[..., None]
        w01 = (wx * (1 - wy))[..., None]
        w10 = ((1 - wx) * wy)[..., None]
        w11 = (wx * wy)[..., None]
        out = (
            vals[:, :, 0] * w00
            + vals[:, :, 1] * w01
            + vals[:, :, 2] * w10
            + vals[:, :, 3] * w11
        )
        return out.reshape(n, hh, ww, c)

    ms = timed(warp_flat, img, flow, name="variant A: flat-batch single take")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e9:.1f} ns/px")
        ref = jax.jit(warp)(img, flow)
        got = jax.jit(warp_flat)(img, flow)
        print(f"{'':60s} max diff vs warp: {float(jnp.abs(ref - got).max()):.2e}")

    # variant B: pure gather cost floor at this index pattern (no weights)
    def floor_take(img, flow):
        n, hh, ww, c = img.shape
        jj = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
        ii = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
        x = (jj + flow[..., 0]).reshape(n, -1)
        y = (ii + flow[..., 1]).reshape(n, -1)
        ix0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, ww - 1)
        iy0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hh - 1)
        flat = img.reshape(n, hh * ww, c)
        idx = iy0 * ww + ix0
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    ms = timed(floor_take, img, flow, name="variant B: 1 take_along_axis, 3-lane rows (floor)")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e9:.1f} ns/px")

    # variant C: quad rows padded to 16 lanes
    def warp_pad16(img, flow):
        n, hh, ww, c = img.shape
        jj = jnp.arange(ww, dtype=jnp.float32)[None, None, :]
        ii = jnp.arange(hh, dtype=jnp.float32)[None, :, None]
        x = (jj + flow[..., 0]).reshape(n, -1)
        y = (ii + flow[..., 1]).reshape(n, -1)
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
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
                jnp.zeros((n, m, 16 - 4 * c), img.dtype),
            ],
            axis=-1,
        )
        py = jnp.clip(iy0, -1, hh) + 1
        px = jnp.clip(ix0, -1, ww) + 1
        base = py * w3 + px
        vals = jnp.take_along_axis(quad, base[..., None], axis=1)[..., : 4 * c]
        vals = vals.reshape(n, p, 4, c)
        w00 = ((1 - wx) * (1 - wy))[..., None]
        w01 = (wx * (1 - wy))[..., None]
        w10 = ((1 - wx) * wy)[..., None]
        w11 = (wx * wy)[..., None]
        out = (
            vals[:, :, 0] * w00
            + vals[:, :, 1] * w01
            + vals[:, :, 2] * w10
            + vals[:, :, 3] * w11
        )
        return out.reshape(n, hh, ww, c)

    ms = timed(warp_pad16, img, flow, name="variant C: quad rows padded to 16 lanes")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e9:.1f} ns/px")

    # variant D: select-blend instead of einsum (is the einsum the cost?)
    def warp_select(img, flow):
        n, hh, ww, c = img.shape
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
        )
        py = jnp.clip(iy0, -1, hh) + 1
        px = jnp.clip(ix0, -1, ww) + 1
        base = py * w3 + px
        v = jnp.take_along_axis(quad, base[..., None], axis=1)
        top = v[..., 0:c] * (1 - wx) + v[..., c : 2 * c] * wx
        bot = v[..., 2 * c : 3 * c] * (1 - wx) + v[..., 3 * c :] * wx
        out = top * (1 - wy) + bot * wy
        return out.reshape(n, hh, ww, c)

    ms = timed(warp_select, img, flow, name="variant D: lerp-tree blend (no einsum)")
    if ms:
        print(f"{'':60s} -> {ms / (k * p) * 1e9:.1f} ns/px")
        ref = jax.jit(warp)(img, flow)
        got = jax.jit(warp_select)(img, flow)
        print(f"{'':60s} max diff vs warp: {float(jnp.abs(ref - got).max()):.2e}")


if __name__ == "__main__":
    main()
