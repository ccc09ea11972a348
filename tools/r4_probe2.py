"""Round-4 probes, part 2: span-gather corr lookup + phase-lerp resize."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gimmvfi_tpu.ops import corr as corr_ops
from gimmvfi_tpu.ops.coords import coords_grid
from gimmvfi_tpu.ops.interp import resize


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


def span_corr_lookup(pyramid, coords, radius=4):
    """One contiguous span gather per query: the (win+1)^2 integer window of
    query p lives inside the flat slice V[p, base : base + win*wlp + win+1]
    of its padded map; fetch it with ONE descriptor, then slice the window
    rows at static offsets and tent-blend to the real-valued taps."""
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

        m = span_rows  # zero margin: any clipped window reads only zeros
        cp = jnp.pad(corr, [(0, 0), (0, 0), (m, m), (m, m)])
        wlp = wl + 2 * m
        hlp = hl + 2 * m
        x0c = jnp.clip(x0, -m, wl + m - span_rows) + m
        y0c = jnp.clip(y0, -m, hl + m - span_rows) + m
        flat2 = cp.reshape(nl, pl, hlp * wlp)
        base = y0c * wlp + x0c  # (N, P)
        span = (span_rows - 1) * wlp + span_rows

        def g1(v, b):
            # v: (P, L); b: (P,) -> (P, span)
            return jax.lax.gather(
                v,
                jnp.stack([jnp.arange(pl, dtype=jnp.int32), b], -1)[:, None, :],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(1, span),
                mode=jax.lax.GatherScatterMode.CLIP,
            )

        spans = jax.vmap(g1)(flat2, base).reshape(nl, pl, span)  # (N, P, span)
        # static strided slice: window row r at offset r*wlp
        g = jnp.stack(
            [spans[:, :, r * wlp : r * wlp + span_rows] for r in range(span_rows)],
            axis=2,
        )  # (N, P, span_rows, span_cols)
        fy_ = fy[..., None, None]
        fx_ = fx[..., None, None]
        gf = g.astype(jnp.float32)
        sy = gf[:, :, :win] * (1.0 - fy_) + gf[:, :, 1:] * fy_
        v = sy[..., :win] * (1.0 - fx_) + sy[..., 1:] * fx_
        v = v.transpose(0, 1, 3, 2)  # x-offset outer (reference order)
        outs.append(v.astype(corr.dtype).reshape(n, h, w, win * win))
    return jnp.concatenate(outs, axis=-1)


def phase_resize_up(img, s: int):
    """Integer-factor bilinear upsample (align_corners=False) as per-phase
    lerps of shifted copies + pixel-shuffle interleave. Pure VPU."""
    n, h, w, c = img.shape
    x = img.astype(jnp.float32)
    # phase k: src = i + (k + 0.5)/s - 0.5
    def axis_up(x, h_axis: bool):
        size = x.shape[1] if h_axis else x.shape[2]
        pads = [(0, 0), (1, 1), (0, 0), (0, 0)] if h_axis else [(0, 0), (0, 0), (1, 1), (0, 0)]
        xp = jnp.pad(x, pads, mode="edge")
        phases = []
        for k in range(s):
            src = (k + 0.5) / s - 0.5
            base = int(np.floor(src))  # -1 or 0
            frac = np.float32(src - base)
            lo = jax.lax.slice_in_dim(xp, base + 1, base + 1 + size, axis=1 if h_axis else 2)
            hi = jax.lax.slice_in_dim(xp, base + 2, base + 2 + size, axis=1 if h_axis else 2)
            # torch clamps src >= 0: phase 0 of the FIRST pixel must not
            # blend with the (edge-padded) -1 tap when src < 0. Edge pad
            # makes lo == hi there, so the lerp is exact anyway.
            phases.append(lo * (1.0 - frac) + hi * frac)
        st = jnp.stack(phases, axis=2 if h_axis else 3)
        if h_axis:
            return st.reshape(n, size * s, *st.shape[3:])
        return st.reshape(*st.shape[:2], size * s, c)

    x = axis_up(x, True)
    x = axis_up(x, False)
    return x.astype(img.dtype)


def phase_resize_down(img, s: int):
    """Integer-factor bilinear downsample (align_corners=False): torch taps
    for scale s are (s*o + s/2 - 1, s*o + s/2) with weight 0.5/0.5 for even
    s. Pure strided-slice average."""
    n, h, w, c = img.shape
    x = img.astype(jnp.float32)
    t0 = s // 2 - 1
    x = 0.5 * (x[:, t0::s][:, : h // s] + x[:, t0 + 1 :: s][:, : h // s])
    x = 0.5 * (x[:, :, t0::s][:, :, : w // s] + x[:, :, t0 + 1 :: s][:, :, : w // s])
    return x.astype(img.dtype)


def main():
    key = jax.random.PRNGKey(0)
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
    timed(
        lambda p, c: span_corr_lookup(corr_ops.CorrPyramid(p), c),
        tuple(pyr.levels), coords, name="corr_lookup span-gather, N=2 @1/8",
    )
    a = corr_ops.corr_lookup(pyr, coords)
    b = span_corr_lookup(pyr, coords)
    print(f"  max abs diff: {jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))):.2e}")

    # resize comparisons
    for c, sc, hh, ww in ((128, 4, 184, 320), (648, 2, 92, 160), (1, 4, 184, 320)):
        x = jax.random.normal(key, (1, hh, ww, c), jnp.bfloat16)
        timed(lambda x: resize(x, float(sc)), x, name=f"resize tent-matmul {c}ch {sc}x up")
        timed(lambda x: phase_resize_up(x, sc), x, name=f"resize phase-lerp  {c}ch {sc}x up")
        d = jnp.max(jnp.abs(resize(x, float(sc)).astype(jnp.float32) - phase_resize_up(x, sc).astype(jnp.float32)))
        print(f"  max abs diff: {d:.2e}")

    x = jax.random.normal(key, (1, 736, 1280, 3), jnp.float32)
    timed(lambda x: resize(x, 0.25), x, name="resize tent-matmul 3ch 4x down")
    timed(lambda x: phase_resize_down(x, 4), x, name="resize phase-avg   3ch 4x down")
    d = jnp.max(jnp.abs(resize(x, 0.25) - phase_resize_down(x, 4)))
    print(f"  max abs diff: {d:.2e}")

    # f32 phase-lerp vs tent matmul exactness (f32 pipeline)
    xf = jax.random.normal(key, (1, 184, 320, 8), jnp.float32)
    d = jnp.max(jnp.abs(resize(xf, 4.0) - phase_resize_up(xf, 4)))
    print(f"  f32 4x up max abs diff: {d:.2e}")


if __name__ == "__main__":
    main()
