"""Round-4 probes, part 3: resize phase-lerp + corr span-gather variants."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gimmvfi_tpu.ops import corr as corr_ops
from gimmvfi_tpu.ops.coords import coords_grid
from gimmvfi_tpu.ops.interp import resize

from r4_probe2 import phase_resize_up, phase_resize_down


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


def span1d_corr_lookup(pyramid, coords, radius=4):
    """One 1-D span gather per query from the fully flattened volume."""
    n, h, w, _ = coords.shape
    p = h * w
    win = 2 * radius + 1
    span_rows = win + 1
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

        m = span_rows
        cp = jnp.pad(corr, [(0, 0), (0, 0), (m, m), (m, m)])
        wlp = wl + 2 * m
        hlp = hl + 2 * m
        x0c = jnp.clip(x0, -m, wl + m - span_rows) + m
        y0c = jnp.clip(y0, -m, hl + m - span_rows) + m
        span = (span_rows - 1) * wlp + span_rows
        vol = cp.reshape(nl, pl * hlp * wlp)
        base = (
            jnp.arange(pl, dtype=jnp.int32)[None, :] * (hlp * wlp)
            + y0c * wlp
            + x0c
        )  # (N, P)

        def g1(v, b):
            # v: (L,), b: (P,) -> (P, span)
            return jax.lax.gather(
                v,
                b[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
                ),
                slice_sizes=(span,),
                mode=jax.lax.GatherScatterMode.CLIP,
            )

        spans = jax.vmap(g1)(vol, base)  # (N, P, span)
        g = jnp.stack(
            [spans[:, :, r * wlp : r * wlp + span_rows] for r in range(span_rows)],
            axis=2,
        )  # (N, P, rows, cols)
        fy_ = fy[..., None, None]
        fx_ = fx[..., None, None]
        gf = g.astype(jnp.float32)
        sy = gf[:, :, :win] * (1.0 - fy_) + gf[:, :, 1:] * fy_
        v = sy[..., :win] * (1.0 - fx_) + sy[..., 1:] * fx_
        v = v.transpose(0, 1, 3, 2)
        outs.append(v.astype(corr.dtype).reshape(n, h, w, win * win))
    return jnp.concatenate(outs, axis=-1)


def rowgather_corr_lookup(pyramid, coords, radius=4):
    """Per query: gather the span_rows FULL map rows (descriptor per row),
    then contract columns with a per-query tent matrix on the MXU."""
    n, h, w, _ = coords.shape
    p = h * w
    win = 2 * radius + 1
    span_rows = win + 1
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

        m = span_rows
        cp = jnp.pad(corr, [(0, 0), (0, 0), (m, m), (0, 0)])  # pad rows only
        hlp = hl + 2 * m
        y0c = jnp.clip(y0, -m, hl + m - span_rows) + m
        rows_flat = cp.reshape(nl, pl * hlp, wl)
        rowbase = jnp.arange(pl, dtype=jnp.int32)[None, :] * hlp + y0c  # (N,P)
        ridx = rowbase[..., None] + jnp.arange(span_rows, dtype=jnp.int32)

        def g1(v, b):
            # v: (P*hlp, wl), b: (P, rows) -> (P, rows, wl)
            return jnp.take_along_axis(
                v[None], b.reshape(1, -1, 1), axis=1
            ).reshape(b.shape[0], b.shape[1], wl)

        g = jax.vmap(g1)(rows_flat, ridx)  # (N, P, rows, wl)
        # column tent: real tap j at cx + d_j -> taps (x0+j, x0+j+1)
        # build (N, P, win, wl) tent over columns with zeros padding
        d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        tx = cx[..., None] + d  # (N, P, win)
        wxm = jnp.maximum(
            0.0, 1.0 - jnp.abs(tx[..., None] - jnp.arange(wl, dtype=jnp.float32))
        )  # (N, P, win, wl)
        gf = g.astype(jnp.float32)
        fy_ = fy[..., None, None]
        sy = gf[:, :, :win] * (1.0 - fy_) + gf[:, :, 1:] * fy_  # (N,P,win,wl)
        # rows currently have zeros-padded y (pad rows) but raw x (clip at
        # image edge not needed: tent handles out-of-range mass)
        v = jnp.einsum(
            "npyw,npxw->npxy", sy, wxm.astype(sy.dtype),
            preferred_element_type=jnp.float32,
        )
        outs.append(v.astype(corr.dtype).reshape(n, h, w, win * win))
    return jnp.concatenate(outs, axis=-1)


def main():
    key = jax.random.PRNGKey(0)

    # resize first (probe2 crashed before reaching these)
    for c, sc, hh, ww in ((128, 4, 184, 320), (648, 2, 92, 160), (1, 4, 184, 320)):
        x = jax.random.normal(key, (1, hh, ww, c), jnp.bfloat16)
        timed(lambda x: resize(x, float(sc)), x, name=f"resize tent-matmul {c}ch {sc}x up")
        timed(lambda x: phase_resize_up(x, sc), x, name=f"resize phase-lerp  {c}ch {sc}x up")
        d = jnp.max(jnp.abs(resize(x, float(sc)).astype(jnp.float32) - phase_resize_up(x, sc).astype(jnp.float32)))
        print(f"  max abs diff: {d:.2e}")

    x = jax.random.uniform(key, (1, 736, 1280, 3), jnp.float32)
    timed(lambda x: resize(x, 0.25), x, name="resize tent-matmul 3ch 4x down")
    timed(lambda x: phase_resize_down(x, 4), x, name="resize phase-avg   3ch 4x down")
    d = jnp.max(jnp.abs(resize(x, 0.25) - phase_resize_down(x, 4)))
    print(f"  max abs diff: {d:.2e}")

    xf = jax.random.normal(key, (1, 184, 320, 8), jnp.float32)
    d = jnp.max(jnp.abs(resize(xf, 4.0) - phase_resize_up(xf, 4)))
    print(f"  f32 4x up max abs diff: {d:.2e}")

    # corr lookup variants
    h8, w8 = 92, 160
    n = 2
    fmap = jax.random.normal(key, (n, h8, w8, 256), jnp.bfloat16)
    pyr = corr_ops.corr_pyramid(fmap, fmap, 4)
    coords = coords_grid(n, h8, w8) + jax.random.normal(
        key, (n, h8, w8, 2), jnp.float32
    ) * 3.0

    timed(
        lambda p, c: corr_ops.corr_lookup(corr_ops.CorrPyramid(p), c),
        tuple(pyr.levels), coords, name="corr_lookup tent-einsum (current), N=2 @1/8",
    )
    a = corr_ops.corr_lookup(pyr, coords)
    try:
        timed(
            lambda p, c: span1d_corr_lookup(corr_ops.CorrPyramid(p), c),
            tuple(pyr.levels), coords, name="corr_lookup span-1d-gather, N=2 @1/8",
        )
        b = span1d_corr_lookup(pyr, coords)
        print(f"  span1d max abs diff: {jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))):.2e}")
    except Exception as e:
        print("span1d failed:", repr(e)[:200])
    try:
        timed(
            lambda p, c: rowgather_corr_lookup(corr_ops.CorrPyramid(p), c),
            tuple(pyr.levels), coords, name="corr_lookup rowgather+tent, N=2 @1/8",
        )
        b = rowgather_corr_lookup(pyr, coords)
        print(f"  rowgather max abs diff: {jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))):.2e}")
    except Exception as e:
        print("rowgather failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
