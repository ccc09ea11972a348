"""All-pairs correlation volumes + windowed pyramid lookup (RAFT / AMT).

Rebuilds `raft/corr.py` (CorrBlock / BidirCorrBlock) the TPU way:

  * the all-pairs volume is one big batched matmul (MXU-friendly):
    corr[n, p, q] = <fmap1[n, p, :], fmap2[n, q, :]> / sqrt(C)
  * the 4-level pyramid is 2x2 average pooling over the *target* spatial dims
  * the per-iteration lookup samples a (2r+1)^2 window around per-pixel
    coordinates with bilinear interpolation (zeros padding, align_corners=True
    — `raft/utils/utils.py:66-80`), concatenated over levels.

The volume is materialized once per pair (reference behavior) and the lookup
is a gather; both live under jit so XLA fuses the pre/post reshapes. A Pallas
lookup kernel can replace `lookup_window` without touching callers.

Functional API (no classes holding tensors): build once with
`corr_pyramid` / `bidir_corr_pyramid`, then call `corr_lookup` per iteration.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def all_pairs_corr(fmap1: Array, fmap2: Array) -> Array:
    """corr (N, H1*W1, H2, W2) from NHWC feature maps, scaled by 1/sqrt(C).

    Accumulation is always f32 (preferred_element_type); the stored volume
    keeps the input dtype — with bf16 feature maps the volume (the single
    biggest tensor at 720p+) halves its HBM footprint and every downstream
    lookup halves its traffic. Precision is DEFAULT: on TPU the f32 path
    would otherwise burn a multi-pass MXU emulation (HIGHEST) for values
    that only feed conv features.
    """
    n, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    a = fmap1.reshape(n, h1 * w1, c)
    b = fmap2.reshape(n, h2 * w2, c)
    corr = jnp.einsum(
        "npc,nqc->npq",
        a,
        b,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(c))
    return corr.reshape(n, h1 * w1, h2, w2).astype(fmap1.dtype)


def _avg_pool_last2(x: Array) -> Array:
    """2x2/stride-2 average pool over the last two spatial dims of (N,P,h,w)."""
    n, p, h, w = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, :, : h2 * 2, : w2 * 2].reshape(n, p, h2, 2, w2, 2)
    return x.mean(axis=(3, 5))


class CorrPyramid(NamedTuple):
    """Correlation pyramid: levels[i] has shape (N, P, h_i, w_i)."""

    levels: tuple[Array, ...]

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def corr_pyramid(fmap1: Array, fmap2: Array, num_levels: int = 4) -> CorrPyramid:
    """Build the RAFT correlation pyramid (`raft/corr.py:127-142`)."""
    corr = all_pairs_corr(fmap1, fmap2)
    levels = [corr]
    for _ in range(num_levels - 1):
        corr = _avg_pool_last2(corr)
        levels.append(corr)
    return CorrPyramid(tuple(levels))


def bidir_corr_pyramid(
    fmap1: Array, fmap2: Array, num_levels: int = 4
) -> tuple[CorrPyramid, CorrPyramid]:
    """Build forward + transposed pyramids (`raft/corr.py:23-44`).

    The transposed volume corr_T[n, q, h1, w1] = corr[n, p(h1,w1), q] serves
    t->1 lookups; both are pooled over their own target dims.
    """
    n, h1, w1, _ = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    corr = all_pairs_corr(fmap1, fmap2)  # (N, H1*W1, h2, w2)
    corr_t = corr.reshape(n, h1 * w1, h2 * w2).transpose(0, 2, 1).reshape(
        n, h2 * w2, h1, w1
    )

    def pyramid(c):
        levels = [c]
        for _ in range(num_levels - 1):
            c = _avg_pool_last2(c)
            levels.append(c)
        return CorrPyramid(tuple(levels))

    return pyramid(corr), pyramid(corr_t)


def _window_offsets(radius: int) -> Array:
    """((2r+1)^2, 2) window offsets, reference channel ordering.

    The reference builds `delta = stack(meshgrid(dy, dx))` and adds it to
    (x, y) centroids (`raft/corr.py:152-158`), so output channel k = i*(2r+1)+j
    samples at (x + d[i], y + d[j]) — the *outer* index walks the x offset.
    Converted pretrained weights depend on this exact ordering.
    """
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    a, b = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([a.reshape(-1), b.reshape(-1)], axis=-1)  # (x_off, y_off)


def corr_lookup(pyramid: CorrPyramid, coords: Array, radius: int = 4) -> Array:
    """Sample (2r+1)^2 windows at `coords` from every pyramid level.

    coords: (N, H, W, 2) pixel coordinates (x, y) in level-0 target space.
    Returns (N, H, W, num_levels*(2r+1)^2), level-major like the reference
    concat (`raft/corr.py:144-165`).

    TPU-native formulation: bilinear sampling at tap position t from a 1-D
    grid is EXACTLY a tent-weight contraction — weight(j) = max(0, 1-|t-j|)
    (zeros padding included: out-of-range taps lose the out-of-range mass).
    The separable 2-D window lookup therefore becomes two batched matmuls
    per level,  out = tentY @ corr_map @ tentX^T,  which run on the MXU
    instead of the element-at-a-time gathers `bilinear_sampler` would emit
    (the reference's CUDA gather is free; a TPU gather is not).
    """
    n, h, w, _ = coords.shape
    p = h * w
    win = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)

    flat = coords.reshape(n, p, 2)
    out_levels = []
    for i, corr in enumerate(pyramid.levels):
        nl, pl, hl, wl = corr.shape
        c = flat / (2.0**i)
        ty = c[..., 1:2] + d  # (N, P, win) tap rows
        tx = c[..., 0:1] + d  # (N, P, win) tap cols
        # tent weights computed in f32 (sub-pixel positions), contracted in
        # the volume's dtype (bf16 when the pipeline runs mixed precision)
        # with f32 accumulation
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(ty[..., None] - jnp.arange(hl, dtype=jnp.float32))
        ).astype(corr.dtype)  # (N, P, win, hl)
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs(tx[..., None] - jnp.arange(wl, dtype=jnp.float32))
        ).astype(corr.dtype)  # (N, P, win, wl)
        rows = jnp.einsum(
            "npyh,nphw->npyw", wy, corr, preferred_element_type=jnp.float32
        ).astype(corr.dtype)
        vals = jnp.einsum(
            "npyw,npxw->npxy", rows, wx, preferred_element_type=jnp.float32
        )  # x-offset outer, matching _window_offsets channel order
        out_levels.append(vals.astype(corr.dtype).reshape(n, h, w, win * win))
    return jnp.concatenate(out_levels, axis=-1)


def bidir_corr_lookup(
    pyramids,
    coords0: Array,
    coords1: Array,
    radius: int = 4,
) -> tuple[Array, Array]:
    """BidirCorrBlock.__call__ (`raft/corr.py:46-83`): lookup both volumes.

    Accepts (CorrPyramid, CorrPyramid) or (WindowedCorr, WindowedCorr) —
    the memory-efficient path used when the materialized volume would not
    fit (the reference's alt_cuda_corr scenario at 2K/4K resolutions)."""
    fwd, bwd = pyramids
    return (
        corr_lookup_any(fwd, coords0, radius),
        corr_lookup_any(bwd, coords1, radius),
    )


# --------------------------------------------------------------------------
# Memory-efficient windowed correlation (the reference's `alt_cuda_corr`,
# `.../flowformer/alt_cuda_corr/correlation_kernel.cu:18-119`, rebuilt for
# TPU). The all-pairs volume is O((HW)^2) and dominates HBM at high
# resolution (2K at DS 1.0: ~5 GB for level 0 alone). Key identity: pyramid
# pooling and bilinear window sampling are LINEAR in the volume, and the
# volume itself is linear in fmap2, so
#
#   bilinear_sample(avgpool^l(corr), tap)[q] = <fmap1[q],
#       bilinear_sample(avgpool^l(fmap2), tap)>
#
# i.e. lookups can sample the l-times-pooled TARGET FEATURE MAP (O(HW * C))
# and contract with the query feature on the fly — exactly equal to the
# materialized path (linearity; verified to float tolerance in
# tests/test_corr.py). Per-iteration cost is a banded row gather (the
# win+1 consecutive target columns per tap row are contiguous in NHWC, so
# one descriptor fetches a whole window row) + one small batched matvec —
# slower per lookup than the materialized volume, so use it only when the
# volume would not fit (corr_pyramid_auto).


class WindowedCorr(NamedTuple):
    """On-the-fly correlation state: query features + pooled target maps."""

    f1: Array  # (N, P, C) level-0 query features, pre-scaled by 1/sqrt(C)
    f2_levels: tuple[Array, ...]  # (N, h_l, w_l, C) pooled target features
    shape_hw: tuple[int, int]  # query (H, W) for reshaping lookups

    @property
    def num_levels(self) -> int:
        return len(self.f2_levels)


def _avg_pool_nhwc(x: Array) -> Array:
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2].reshape(n, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))


def windowed_corr_pyramid(
    fmap1: Array, fmap2: Array, num_levels: int = 4
) -> WindowedCorr:
    """Build the lazy-correlation state (no volume is ever materialized)."""
    n, h1, w1, c = fmap1.shape
    f1 = (fmap1.astype(jnp.float32) / jnp.sqrt(jnp.float32(c))).astype(
        fmap1.dtype
    )
    levels = [fmap2]
    for _ in range(num_levels - 1):
        levels.append(_avg_pool_nhwc(levels[-1]))
    return WindowedCorr(f1.reshape(n, h1 * w1, c), tuple(levels), (h1, w1))


def bidir_windowed_corr_pyramid(
    fmap1: Array, fmap2: Array, num_levels: int = 4
) -> tuple[WindowedCorr, WindowedCorr]:
    """Forward + transposed lazy correlation (roles swapped — the
    transposed volume corr_T[q, r] = corr[r, q] = <fmap2[q], fmap1[r]>)."""
    return (
        windowed_corr_pyramid(fmap1, fmap2, num_levels),
        windowed_corr_pyramid(fmap2, fmap1, num_levels),
    )


def windowed_corr_lookup(wc: WindowedCorr, coords: Array, radius: int = 4) -> Array:
    """Windowed lookup, same output as `corr_lookup` on the materialized
    pyramid (channel order: x-offset outer; zeros padding; pixel coords).

    Per level: gather, for each query and each of win+2 tap rows, the
    win+2 consecutive target columns as ONE contiguous row (banded
    gather); contract channels with f1 (batched matvec); tent-blend the
    (win+2)^2 integer grid down to the win^2 real-valued taps.
    """
    n, h, w, _ = coords.shape
    p = h * w
    win = 2 * radius + 1
    f1 = wc.f1  # (N, P, C)
    c_dim = f1.shape[-1]

    flat = coords.reshape(n, p, 2).astype(jnp.float32)
    out_levels = []
    for i, f2 in enumerate(wc.f2_levels):
        nl, hl, wl, _ = f2.shape
        cc = flat / (2.0**i)
        cx, cy = cc[..., 0], cc[..., 1]
        # integer window base: taps live at (floor(c)-r .. floor(c)+r+1)
        x0 = jnp.floor(cx).astype(jnp.int32) - radius
        y0 = jnp.floor(cy).astype(jnp.int32) - radius
        fx = cx - jnp.floor(cx)
        fy = cy - jnp.floor(cy)

        m = win + 2  # zero margin: any partially-valid window stays exact
        span = win + 1
        f2p = jnp.pad(f2, [(0, 0), (m, m), (m, m), (0, 0)])
        wlp = wl + 2 * m
        x0c = jnp.clip(x0, -m, wl + m - span) + m
        y0c = jnp.clip(y0, -m, hl + m - span) + m
        flat2 = f2p.reshape(nl, (hl + 2 * m) * wlp, c_dim)
        # banded view: row (y, x) holds f2p[y, x : x + span] flattened, so
        # one descriptor per (query, tap-row) fetches span * C values
        bands = jnp.concatenate(
            [flat2[:, k : flat2.shape[1] - span + 1 + k] for k in range(span)],
            axis=-1,
        )  # (N, M, span*C)
        base = y0c * wlp + x0c  # (N, P)
        rows = jnp.arange(span, dtype=jnp.int32)[None, None, :]
        idx = base[..., None] + rows * wlp  # (N, P, span)
        g = jnp.take_along_axis(
            bands, idx.reshape(n, p * span)[..., None], axis=1
        )  # (N, P*span, span*C)
        g = g.reshape(n, p, span, span, c_dim)  # [query, tap-row y, col x, C]

        # channel contraction first (keeps the tent blend tiny):
        s = jnp.einsum(
            "npyxc,npc->npyx", g, f1, preferred_element_type=jnp.float32
        )  # (N, P, span, span)

        # tent blend: real tap (dy, dx) = integer grid (dy..dy+1, dx..dx+1)
        # with weights from the shared fractional offset
        fy_ = fy[..., None, None]
        fx_ = fx[..., None, None]
        sy = s[:, :, :win] * (1.0 - fy_) + s[:, :, 1:] * fy_  # (N,P,win,span)
        v = sy[..., :win] * (1.0 - fx_) + sy[..., 1:] * fx_  # (N,P,win,win)
        # output channel k = i*win + j samples (x + d[i], y + d[j]):
        # x-offset OUTER (reference ordering) -> transpose the tap dims
        v = v.transpose(0, 1, 3, 2)
        out_levels.append(
            v.astype(f1.dtype).reshape(n, h, w, win * win)
        )
    return jnp.concatenate(out_levels, axis=-1)


def corr_pyramid_auto(
    fmap1: Array,
    fmap2: Array,
    num_levels: int = 4,
    max_volume_bytes: int = 2 << 30,
):
    """Materialize the pyramid when it fits, else go windowed.

    The decision is static (shape-based), so jit traces exactly one path.
    """
    n, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    itemsize = jnp.dtype(fmap1.dtype).itemsize
    vol = n * h1 * w1 * h2 * w2 * itemsize * 4 // 3  # sum of pyramid levels
    if vol <= max_volume_bytes:
        return corr_pyramid(fmap1, fmap2, num_levels)
    return windowed_corr_pyramid(fmap1, fmap2, num_levels)


def corr_lookup_any(pyr, coords: Array, radius: int = 4) -> Array:
    """Dispatch `corr_lookup` over CorrPyramid | WindowedCorr."""
    if isinstance(pyr, WindowedCorr):
        return windowed_corr_lookup(pyr, coords, radius)
    return corr_lookup(pyr, coords, radius)


def bidir_corr_pyramid_auto(
    fmap1: Array,
    fmap2: Array,
    num_levels: int = 4,
    max_volume_bytes: int = 2 << 30,
):
    """Bidirectional pyramid: materialized when both volumes fit, windowed
    otherwise (the synthesis-side alt_cuda_corr dispatch; the decision is
    static so jit traces exactly one path)."""
    n, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    itemsize = jnp.dtype(fmap1.dtype).itemsize
    vol = 2 * n * h1 * w1 * h2 * w2 * itemsize * 4 // 3  # fwd + transposed
    if vol <= max_volume_bytes:
        return bidir_corr_pyramid(fmap1, fmap2, num_levels)
    return bidir_windowed_corr_pyramid(fmap1, fmap2, num_levels)
