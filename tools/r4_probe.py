"""Round-4 optimization probes on the TPU chip.

Measures candidate reformulations against the current hot paths:
  1. corr_lookup: tent-matmul einsum (current) vs banded row-gather
  2. resize_bilinear: f32 HIGHEST tent einsum (current) vs bf16 contraction
  3. dual softsplat: two calls (current) vs one batched call
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gimmvfi_tpu.ops import corr as corr_ops
from gimmvfi_tpu.ops.coords import coords_grid
from gimmvfi_tpu.ops.interp import resize
from gimmvfi_tpu.ops.softsplat import softsplat


def timed(fn, *args, iters=6, name=""):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).astype(jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.2f} ms", flush=True)
    return ms


def gather_corr_lookup(pyramid, coords, radius=4):
    """Banded row-gather formulation: per query and tap row, ONE descriptor
    fetches the (win+1) consecutive columns; tent-blend down to win taps."""
    n, h, w, _ = coords.shape
    p = h * w
    win = 2 * radius + 1
    span = win + 1
    flat = coords.reshape(n, p, 2).astype(jnp.float32)
    outs = []
    for i, corr in enumerate(pyramid.levels):
        nl, pl, hl, wl = corr.shape
        cc = flat / (2.0**i)
        cx, cy = cc[..., 0], cc[..., 1]
        x0 = jnp.floor(cx).astype(jnp.int32) - radius
        y0 = jnp.floor(cy).astype(jnp.int32) - radius
        fx = cx - jnp.floor(cx)
        fy = cy - jnp.floor(cy)

        m = span  # zero margin so any partially-valid window stays exact
        cp = jnp.pad(corr, [(0, 0), (0, 0), (m, m), (m, m)])
        wlp = wl + 2 * m
        hlp = hl + 2 * m
        x0c = jnp.clip(x0, -m, wl + m - span) + m
        y0c = jnp.clip(y0, -m, hl + m - span) + m
        flat2 = cp.reshape(nl, pl, hlp * wlp)
        base = y0c * wlp + x0c  # (N, P)
        rows = jnp.arange(span, dtype=jnp.int32)[None, None, :]
        # (N, P, span_rows, span_cols): gather span rows of span consecutive
        idx = base[..., None, None] + rows[..., None] * wlp + jnp.arange(
            span, dtype=jnp.int32
        )
        g = jnp.take_along_axis(
            flat2, idx.reshape(n, p, span * span), axis=2
        ).reshape(n, p, span, span)
        fy_ = fy[..., None, None]
        fx_ = fx[..., None, None]
        sy = g[:, :, :win] * (1.0 - fy_) + g[:, :, 1:] * fy_
        v = sy[..., :win] * (1.0 - fx_) + sy[..., 1:] * fx_
        v = v.transpose(0, 1, 3, 2)  # x-offset outer
        outs.append(v.astype(corr.dtype).reshape(n, h, w, win * win))
    return jnp.concatenate(outs, axis=-1)


def resize_bf16(img, scale):
    """Tent-matmul resize contracting in bf16 (dyadic scales are exact)."""
    from gimmvfi_tpu.ops.interp import _axis_tent_matrix

    n, h, w, c = img.shape
    oh, ow = int(h * scale), int(w * scale)
    x = img
    if oh != h:
        mh = jnp.asarray(_axis_tent_matrix(h, oh, False, 1.0 / scale)).astype(
            jnp.bfloat16
        )
        x = jnp.einsum(
            "nhwc,hH->nHwc", x, mh, preferred_element_type=jnp.float32
        ).astype(img.dtype)
    if ow != w:
        mw = jnp.asarray(_axis_tent_matrix(w, ow, False, 1.0 / scale)).astype(
            jnp.bfloat16
        )
        x = jnp.einsum(
            "nhwc,wW->nhWc", x, mw, preferred_element_type=jnp.float32
        ).astype(img.dtype)
    return x


def main():
    key = jax.random.PRNGKey(0)
    h8, w8 = 92, 160  # 720p /8

    # ---- 1. corr lookup (RAFT refine-loop shape, bidir N=2)
    n = 2
    fmap = jax.random.normal(key, (n, h8, w8, 256), jnp.bfloat16)
    pyr = corr_ops.corr_pyramid(fmap, fmap, 4)
    coords = coords_grid(n, h8, w8) + jax.random.normal(
        key, (n, h8, w8, 2), jnp.float32
    ) * 3.0

    t_e = timed(
        lambda p, c: corr_ops.corr_lookup(corr_ops.CorrPyramid(p), c),
        tuple(pyr.levels), coords, name="corr_lookup tent-einsum (current), N=2 @1/8",
    )
    t_g = timed(
        lambda p, c: gather_corr_lookup(corr_ops.CorrPyramid(p), c),
        tuple(pyr.levels), coords, name="corr_lookup banded-gather, N=2 @1/8",
    )
    a = corr_ops.corr_lookup(pyr, coords)
    b = gather_corr_lookup(pyr, coords)
    print(f"  max abs diff: {jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))):.2e}")

    # ---- 2. resize
    for c, sc in ((128, 4.0), (648, 2.0), (64, 4.0)):
        hh = h8 * 2 if sc == 2.0 else 184
        ww = w8 * 2 if sc == 2.0 else 320
        x = jax.random.normal(key, (1, hh, ww, c), jnp.bfloat16)
        timed(lambda x: resize(x, sc), x, name=f"resize f32-HIGHEST (current) {c}ch {sc}x")
        timed(lambda x: resize_bf16(x, sc), x, name=f"resize bf16-contraction {c}ch {sc}x")
        d = jnp.max(jnp.abs(resize(x, sc).astype(jnp.float32) - resize_bf16(x, sc).astype(jnp.float32)))
        print(f"  max abs diff: {d:.2e}")

    # ---- 3. dual splat
    hf, wf = 736, 1280
    lat0 = jax.random.normal(key, (1, hf, wf, 16), jnp.bfloat16)
    lat1 = jax.random.normal(key, (1, hf, wf, 16), jnp.bfloat16)
    f01 = jax.random.normal(key, (1, hf, wf, 2), jnp.float32) * 8
    f10 = jax.random.normal(key, (1, hf, wf, 2), jnp.float32) * 8
    w1 = jax.random.uniform(key, (1, hf, wf, 1), jnp.float32)
    w2 = jax.random.uniform(key, (1, hf, wf, 1), jnp.float32)

    def two_calls(l0, l1, f0, f1, w1, w2):
        s0 = softsplat(l0, f0 * 0.5, w1, "linear-zeroeps")
        s1 = softsplat(l1, f1 * 0.5, w2, "linear-zeroeps")
        return jnp.concatenate([s0, s1], -1)

    def one_call(l0, l1, f0, f1, w1, w2):
        lat = jnp.concatenate([l0, l1], 0)
        flo = jnp.concatenate([f0 * 0.5, f1 * 0.5], 0)
        met = jnp.concatenate([w1, w2], 0)
        s = softsplat(lat, flo, met, "linear-zeroeps")
        return jnp.concatenate([s[:1], s[1:]], -1)

    timed(two_calls, lat0, lat1, f01, f10, w1, w2, name="dual splat: two calls (current) 720p")
    timed(one_call, lat0, lat1, f01, f10, w1, w2, name="dual splat: one batched call 720p")
    a = two_calls(lat0, lat1, f01, f10, w1, w2)
    b = one_call(lat0, lat1, f01, f10, w1, w2)
    print(f"  max abs diff: {jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))):.2e}")


if __name__ == "__main__":
    main()
