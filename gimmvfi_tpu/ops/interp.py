"""Bilinear sampling / warping / resizing with PyTorch-exact semantics.

The reference model mixes several interpolation conventions
(`/root/reference/src/models/generalizable_INR/modules/fi_utils.py:19-70`,
`raft/utils/utils.py:66-93`):

  * backward warp           : grid_sample, bilinear, border padding, align_corners=True
  * correlation lookup      : grid_sample, bilinear, zeros padding, align_corners=True
  * resize (decoders, DS)   : F.interpolate bilinear, align_corners=False
  * upflow8                 : F.interpolate bilinear, align_corners=True
  * hyponet latent resample : F.interpolate bilinear (size=), align_corners=False

Getting these exactly right is where silent PSNR drift comes from, so each
helper here states its convention and is unit-tested against torch-CPU goldens
(tests/test_interp.py).

All functions are channels-last (NHWC) and pure, so they fuse under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_2d(img: Array, ix: Array, iy: Array) -> Array:
    """Gather img[n, iy, ix, :] for integer index arrays.

    img: (N, H, W, C); ix, iy: (N, P) int32 already in-bounds.
    Returns (N, P, C).
    """
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N, P)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def quad_gather(img: Array, ix0: Array, iy0: Array, padding_mode: str) -> Array:
    """Fetch the 2x2 corner block at integer base (ix0, iy0) per point.

    TPU formulation: XLA row-gathers are DMA-descriptor-bound (~15 ns/row,
    nearly independent of row width), so the four bilinear corners are
    fetched with ONE gather of 4C-wide rows from a "quad" view of the
    padded image, instead of four separate gathers (~2.3x at 720p).
    Padding: edge for border mode (clamp semantics at the frame edge fall
    out of the padding), zeros for zeros mode (the caller's masked weights
    make far-out-of-range values irrelevant).

    img: (N, H, W, C); ix0/iy0: (N, P) int32 (any values; clamped).
    Returns (N, P, 4, C) with corner order 00, 01 (x+1), 10 (y+1), 11 —
    each corner's value equals img[clip(iy0+dy, 0, H-1), clip(ix0+dx, ...)]
    in border mode (zeros mode differs only where the caller masks).
    """
    n, h, w, c = img.shape
    mode = "edge" if padding_mode == "border" else "constant"
    # 1 px before / 2 px after each spatial dim: the +1 corner of a base
    # clamped to the far pad row/col must itself stay in-buffer (edge pad
    # replicates the border pixel, reproducing clip(corner, 0, size-1))
    imgp = jnp.pad(img, [(0, 0), (1, 2), (1, 2), (0, 0)], mode=mode)
    w3 = w + 3
    flat = imgp.reshape(n, (h + 3) * w3, c)

    py = jnp.clip(iy0, -1, h) + 1  # [0, h+1]
    px = jnp.clip(ix0, -1, w) + 1  # [0, w+1]
    base = py * w3 + px

    m = (h + 1) * w3 + w + 2  # exclusive bound for base indices
    quad = jnp.concatenate(
        [
            flat[:, :m],
            flat[:, 1 : m + 1],
            flat[:, w3 : w3 + m],
            flat[:, w3 + 1 : w3 + 1 + m],
        ],
        axis=-1,
    )  # (N, m, 4C); channel block k = corner (dy, dx) = (k // 2, k % 2)

    # XLA's TPU row-gather fast path (~10 ns/row, measured
    # tools/gather_cost_probe.py) only engages for rows <= 8 lanes; the
    # 4C-lane quad row falls off it at C >= 3 (26 ns). Two lane-exact
    # rescues, both bit-identical to the plain take below:
    #   * bf16 payload, C <= 4: bitcast bf16 pairs into f32 lanes so the
    #     whole quad row is 2C <= 8 f32 lanes -> ONE fast-path gather
    #     (11 ns/px for the 3-ch image warps, 2.3x).
    #   * f32 payload, C in (3, 4): two gathers of 2C <= 8 lane rows
    #     (horizontal corner pairs at +0 / +w3), ~21 vs 26 ns/px.
    if img.dtype == jnp.bfloat16 and c <= 4:
        packed = jax.lax.bitcast_convert_type(
            quad.reshape(n, m, 2 * c, 2), jnp.float32
        )  # (N, m, 2C) f32 lanes carrying bf16 pairs
        got = jnp.take_along_axis(packed, base[..., None], axis=1)
        vals = jax.lax.bitcast_convert_type(got, jnp.bfloat16)
    elif img.dtype == jnp.float32 and 2 < c <= 4:
        top = jnp.take_along_axis(quad[..., : 2 * c], base[..., None], axis=1)
        bot = jnp.take_along_axis(quad[..., 2 * c :], base[..., None], axis=1)
        vals = jnp.concatenate([top, bot], axis=-1)
    else:
        vals = jnp.take_along_axis(quad, base[..., None], axis=1)  # (N, P, 4C)
    return vals.reshape(n, base.shape[1], 4, c)


def bilinear_sample(
    img: Array,
    x: Array,
    y: Array,
    padding_mode: str = "zeros",
) -> Array:
    """Sample `img` at continuous pixel coordinates (x, y), bilinear.

    img: (N, H, W, C). x, y: (N, P) float pixel coordinates (0..W-1, 0..H-1).
    padding_mode: "zeros" (out-of-bounds taps contribute 0, like
    grid_sample zeros) or "border" (taps clamp to the border).

    Returns (N, P, C).
    """
    n, h, w, c = img.shape
    dtype = img.dtype
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    ix0 = x0f.astype(jnp.int32)
    iy0 = y0f.astype(jnp.int32)

    vals = quad_gather(img, ix0, iy0, padding_mode)  # (N, P, 4, C)

    w00 = (1.0 - wx) * (1.0 - wy)
    w01 = wx * (1.0 - wy)
    w10 = (1.0 - wx) * wy
    w11 = wx * wy
    if padding_mode == "zeros":

        def inb(ix, iy):
            return (
                (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            ).astype(jnp.float32)

        w00 = w00 * inb(ix0, iy0)
        w01 = w01 * inb(ix0 + 1, iy0)
        w10 = w10 * inb(ix0, iy0 + 1)
        w11 = w11 * inb(ix0 + 1, iy0 + 1)

    # corner order matches quad blocks: 00, 01 (x+1), 10 (y+1), 11
    weights = jnp.stack([w00, w01, w10, w11], axis=-1).astype(dtype)
    return jnp.einsum("npk,npkc->npc", weights, vals)


def grid_sample(
    img: Array,
    grid: Array,
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> Array:
    """torch.nn.functional.grid_sample equivalent (bilinear), NHWC.

    img: (N, H, W, C); grid: (N, Hg, Wg, 2) normalized coords in [-1, 1],
    grid[..., 0] = x, grid[..., 1] = y. Returns (N, Hg, Wg, C).
    """
    n, h, w, _ = img.shape
    gh, gw = grid.shape[1:3]
    gx = grid[..., 0].reshape(n, -1)
    gy = grid[..., 1].reshape(n, -1)
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    out = bilinear_sample(img, x, y, padding_mode=padding_mode)
    return out.reshape(n, gh, gw, -1)


def warp(img: Array, flow: Array) -> Array:
    """Backward-warp `img` by `flow` (border padding, align_corners=True).

    Matches the reference `warp` (`fi_utils.py:19-49`): sample position for
    output pixel (i, j) is (j + u, i + v) in pixel coordinates, taps clamped
    to the border.

    img: (N, H, W, C); flow: (N, H, W, 2) with flow[..., 0]=u (x), 1=v (y).
    """
    n, h, w, _ = img.shape
    jj = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ii = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = (jj + flow[..., 0]).reshape(n, -1)
    y = (ii + flow[..., 1]).reshape(n, -1)
    out = bilinear_sample(img, x, y, padding_mode="border")
    return out.reshape(n, h, w, -1)


def bilinear_sampler(img: Array, coords: Array) -> Array:
    """RAFT's pixel-coordinate sampler (`raft/utils/utils.py:66-80`).

    img: (N, H, W, C); coords: (N, Hg, Wg, 2) pixel coords (x, y).
    grid_sample with zeros padding, align_corners=True — in pixel space the
    position is used as-is.
    """
    n = img.shape[0]
    gh, gw = coords.shape[1:3]
    x = coords[..., 0].reshape(n, -1)
    y = coords[..., 1].reshape(n, -1)
    out = bilinear_sample(img, x, y, padding_mode="zeros")
    return out.reshape(n, gh, gw, -1)


def _resize_axis_weights(
    in_size: int, out_size: int, align_corners: bool, scale: float | None = None
):
    """Return (idx0, idx1, w1) for 1-D bilinear resize along one axis.

    `scale` is the in/out pixel ratio; torch uses the user-provided
    scale_factor directly when one is given (recompute_scale_factor=None),
    which differs from in_size/out_size when sizes don't divide evenly.
    """
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / (out_size - 1)
        )
    elif align_corners:
        src = jnp.zeros((out_size,), dtype=jnp.float32)
    else:
        scale = in_size / out_size if scale is None else scale
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    # torch clamps negative source positions to 0; positions beyond the last
    # pixel collapse onto it because both taps clamp to in_size-1.
    src = jnp.maximum(src, 0.0)
    i0 = jnp.minimum(jnp.floor(src).astype(jnp.int32), in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _axis_tent_matrix(
    in_size: int, out_size: int, align_corners: bool, scale: float | None
):
    """(in_size, out_size) f32 numpy tent matrix: column o holds the two
    bilinear tap weights of output position o (numpy mirror of
    `_resize_axis_weights` — identical f32 arithmetic, so both formulations
    pick the same floor indices even at ULP boundaries)."""
    import numpy as np

    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float32) * np.float32(
            (in_size - 1) / (out_size - 1)
        )
    elif align_corners:
        src = np.zeros((out_size,), dtype=np.float32)
    else:
        s = in_size / out_size if scale is None else scale
        src = (np.arange(out_size, dtype=np.float32) + np.float32(0.5)) * np.float32(
            s
        ) - np.float32(0.5)
    src = np.maximum(src, np.float32(0.0))
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(np.float32)
    m = np.zeros((in_size, out_size), np.float32)
    o = np.arange(out_size)
    np.add.at(m, (i0, o), 1.0 - w1)
    np.add.at(m, (i1, o), w1)
    return m


# above this in*out product the tent matrix gets large; fall back to the
# gather formulation (never reached by the model's own resizes)
_TENT_MATMUL_MAX = 32 << 20

# NOTE: a per-phase slice-lerp formulation for power-of-two upscales
# (phase-constant fractional offsets -> s static slice-lerps + interleave)
# was probed in round 4 (tools/r4_probe3.py): 1.4-2.6x faster STANDALONE and
# bit-exact, but a ~10% END-TO-END regression at 720p (2.44 vs 2.70 fps) —
# the interleave's stack+reshape emits degenerate layouts that poison the
# downstream f_in concat/convs with relayout copies, the same failure mode
# traced for gather resizes (see resize_bilinear docstring). Tent matmuls
# stay the production path.


def resize_bilinear(
    img: Array,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    scale: float | None = None,
) -> Array:
    """F.interpolate(..., mode="bilinear") equivalent, NHWC, separable.

    img: (N, H, W, C) -> (N, out_h, out_w, C). No antialiasing (torch
    semantics). align_corners picks the torch coordinate convention.

    TPU formulation: 1-D bilinear resampling is a tent-weight matrix
    contraction, so each axis is one einsum against a trace-time-constant
    (in, out) matrix — it runs on the MXU with standard tiled layouts.
    The index-arithmetic alternatives (gathers, or slice-blend interleaves)
    produce degenerate T(1,128) layouts that poison every downstream
    concat/copy with relayout passes (traced: the 273-ch f_in concat alone
    cost 27 ms at 720p). HIGHEST precision keeps true-f32 tent blending
    (same values as the lerp formulation to fma rounding).
    """
    n, h, w, c = img.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return img
    dtype = img.dtype
    x = img.astype(jnp.float32)

    hi = jax.lax.Precision.HIGHEST
    if oh != h:
        if h * oh <= _TENT_MATMUL_MAX:
            mh = jnp.asarray(_axis_tent_matrix(h, oh, align_corners, scale))
            x = jnp.einsum("nhwc,hH->nHwc", x, mh, precision=hi)
        else:
            i0, i1, wy = _resize_axis_weights(h, oh, align_corners, scale)
            x = (
                x[:, i0] * (1.0 - wy)[None, :, None, None]
                + x[:, i1] * wy[None, :, None, None]
            )
    if ow != w:
        if w * ow <= _TENT_MATMUL_MAX:
            mw = jnp.asarray(_axis_tent_matrix(w, ow, align_corners, scale))
            x = jnp.einsum("nhwc,wW->nhWc", x, mw, precision=hi)
        else:
            j0, j1, wx = _resize_axis_weights(w, ow, align_corners, scale)
            x = (
                x[:, :, j0] * (1.0 - wx)[None, None, :, None]
                + x[:, :, j1] * wx[None, None, :, None]
            )
    return x.astype(dtype)


def resize(img: Array, scale_factor: float, align_corners: bool = False) -> Array:
    """Reference `resize` (`fi_utils.py:67-70`): scale-factor bilinear resize."""
    n, h, w, c = img.shape
    oh = int(h * scale_factor)
    ow = int(w * scale_factor)
    return resize_bilinear(
        img, (oh, ow), align_corners=align_corners, scale=1.0 / scale_factor
    )


def upflow8(flow: Array) -> Array:
    """8x bilinear upsampling of flow, scaled by 8 (`raft/utils/utils.py:91-93`).

    align_corners=True, matching the reference.
    """
    n, h, w, _ = flow.shape
    return 8.0 * resize_bilinear(flow, (8 * h, 8 * w), align_corners=True)


def avg_pool2x2(x: Array) -> Array:
    """F.avg_pool2d(x, 2, stride=2) equivalent, NHWC; floors odd sizes."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2]
    x = x.reshape(n, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))
