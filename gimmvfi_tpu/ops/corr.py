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
    pyramids: tuple[CorrPyramid, CorrPyramid],
    coords0: Array,
    coords1: Array,
    radius: int = 4,
) -> tuple[Array, Array]:
    """BidirCorrBlock.__call__ (`raft/corr.py:46-83`): lookup both volumes."""
    fwd, bwd = pyramids
    return (
        corr_lookup(fwd, coords0, radius),
        corr_lookup(bwd, coords1, radius),
    )
