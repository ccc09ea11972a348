"""Softmax/linear/avg/sum forward splatting (softsplat) for TPU.

Rebuilds the reference CuPy/CUDA kernel
(`/root/reference/src/models/generalizable_INR/modules/softsplat.py:286-421`)
as an XLA program: each source pixel (i, j) scatters `value * weight` into the
four destination pixels around (j + u, i + v) with bilinear weights; the
`avg`/`linear`/`softmax` modes append a weight channel and normalize by it
with one of three epsilon policies (`-addeps`, `-zeroeps`, `-clipeps`).

Unlike the reference's `atomicAdd` (non-deterministic float accumulation
order), XLA's scatter-add has a fixed reduction order, so this implementation
is bit-deterministic run-to-run — an intentional improvement (SURVEY.md §5).

Gradients come from JAX autodiff: d/d(value) is the bilinear gather the
reference implements as `softsplat_ingrad`, and d/d(flow) flows through the
bilinear weights with the corner positions treated as constants (floor has
zero gradient) — exactly the reference `softsplat_flowgrad` semantics.

Layout: channels last. `ten_in` (N, H, W, C), `flow` (N, H, W, 2),
`metric` (N, H, W, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import quad_gather

Array = jax.Array

_EPS = 1e-7  # 0.0000001 in the reference


def _splat_core(ten_in: Array, flow: Array) -> Array:
    """Scatter-add splat of ten_in along flow. Shapes: (N,H,W,C), (N,H,W,2).

    On TPU this dispatches to the Pallas sorted-window kernel
    (ops/splat_pallas.py, ~10x faster than XLA's scatter-add at 720p) with
    gather-based gradients; elsewhere (CPU tests) it is the XLA scatter-add
    below, differentiated by autodiff. Both are deterministic and agree to
    f32 rounding.
    """
    n, h, w, _ = ten_in.shape
    if not _pallas_size_ok(n, h, w):
        return _splat_core_xla(ten_in, flow)
    # Platform must be resolved at LOWERING time, not from the default
    # backend: under axon the TPU plugin force-registers itself even when
    # JAX_PLATFORMS=cpu, so jax.devices()[0].platform says "tpu" while the
    # driver's multichip dryrun compiles for explicit CPU devices (and
    # pallas_call has no CPU lowering). platform_dependent picks the branch
    # per compilation target; axon lowers as "tpu".
    return jax.lax.platform_dependent(
        ten_in, flow, tpu=_splat_core_pallas, default=_splat_core_xla
    )


def _pallas_size_ok(n: int, h: int, w: int) -> bool:
    total = n * (h * w + 2 * (w + 1))
    # tiny inputs / key-exactness bound (f32 key channel)
    return h * w >= 4096 and total < (1 << 24)


def _geometry(flow: Array, h: int, w: int):
    """Shared forward/backward splat geometry (sanitized positions, integer
    corners, bilinear weight factors, per-corner in-bounds masks)."""
    f32 = jnp.float32
    u = flow[..., 0].astype(f32)
    v = flow[..., 1].astype(f32)
    jj = jnp.arange(w, dtype=f32)[None, None, :]
    ii = jnp.arange(h, dtype=f32)[None, :, None]
    x = jj + u
    y = ii + v
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    x = jnp.where(finite, x, -10.0)
    y = jnp.where(finite, y, -10.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    ix0 = x0f.astype(jnp.int32)
    iy0 = y0f.astype(jnp.int32)
    wx1 = x - x0f
    wy1 = y - y0f

    def inb(ix, iy):
        return ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)).astype(f32)

    masks = (
        inb(ix0, iy0),
        inb(ix0 + 1, iy0),
        inb(ix0, iy0 + 1),
        inb(ix0 + 1, iy0 + 1),
    )
    return ix0, iy0, wx1, wy1, masks


@jax.custom_vjp
def _splat_core_pallas(ten_in: Array, flow: Array) -> Array:
    from .splat_pallas import splat_corners_sorted

    out = splat_corners_sorted(ten_in.astype(jnp.float32), flow)
    return out.astype(ten_in.dtype)


def _splat_pallas_fwd(ten_in, flow):
    return _splat_core_pallas(ten_in, flow), (ten_in, flow)


def _splat_pallas_bwd(res, g):
    """Splat gradients as gathers (the reference's softsplat_ingrad /
    softsplat_flowgrad are also gathers, `softsplat.py:478-636`):
      d ten_in = bilinear gather of g at the splat position;
      d flow   = value-weighted corner differences of g.
    One quad_gather serves both."""
    ten_in, flow = res
    n, h, w, c = ten_in.shape
    p = h * w
    f32 = jnp.float32
    g32 = g.astype(f32)
    ix0, iy0, wx1, wy1, masks = _geometry(flow, h, w)
    ix0 = ix0.reshape(n, p)
    iy0 = iy0.reshape(n, p)
    wx1 = wx1.reshape(n, p)
    wy1 = wy1.reshape(n, p)
    m00, m01, m10, m11 = (m.reshape(n, p) for m in masks)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    gq = quad_gather(g32, ix0, iy0, "zeros")  # (N, P, 4, C)

    weights = jnp.stack(
        [wx0 * wy0 * m00, wx1 * wy0 * m01, wx0 * wy1 * m10, wx1 * wy1 * m11],
        axis=-1,
    )  # (N, P, 4)
    d_ten = jnp.einsum("npk,npkc->npc", weights, gq)
    d_ten = d_ten.reshape(n, h, w, c).astype(ten_in.dtype)

    # s_k[p] = <ten_in[p], g[corner_k(p)]>
    vflat = ten_in.astype(f32).reshape(n, p, c)
    sk = jnp.einsum("npc,npkc->npk", vflat, gq)  # (N, P, 4)
    s00, s01, s10, s11 = (sk[..., k] for k in range(4))
    du = (-wy0 * m00 * s00 + wy0 * m01 * s01 - wy1 * m10 * s10 + wy1 * m11 * s11)
    dv = (-wx0 * m00 * s00 - wx1 * m01 * s01 + wx0 * m10 * s10 + wx1 * m11 * s11)
    d_flow = jnp.stack([du, dv], axis=-1).reshape(n, h, w, 2).astype(flow.dtype)
    return d_ten, d_flow


_splat_core_pallas.defvjp(_splat_pallas_fwd, _splat_pallas_bwd)


def _splat_core_xla(ten_in: Array, flow: Array) -> Array:
    """Scatter-add splat of ten_in along flow. Shapes: (N,H,W,C), (N,H,W,2)."""
    n, h, w, c = ten_in.shape
    f32 = jnp.float32
    u = flow[..., 0].astype(f32)
    v = flow[..., 1].astype(f32)

    jj = jnp.arange(w, dtype=f32)[None, None, :]
    ii = jnp.arange(h, dtype=f32)[None, :, None]
    x = jj + u  # (N, H, W)
    y = ii + v

    finite = jnp.isfinite(x) & jnp.isfinite(y)
    x = jnp.where(finite, x, -10.0)
    y = jnp.where(finite, y, -10.0)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # bilinear corner weights; corner integer positions are non-differentiable
    wx1 = x - jax.lax.stop_gradient(x0f)
    wy1 = y - jax.lax.stop_gradient(y0f)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    vals = ten_in.astype(f32).reshape(n, h * w, c)
    out = jnp.zeros((n, h * w, c), dtype=f32)

    def scatter(out, ix, iy, wgt):
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        # out-of-bounds -> index h*w, dropped by mode="drop"
        idx = jnp.where(ok, iy * w + ix, h * w).reshape(n, h * w)
        upd = vals * wgt.reshape(n, h * w, 1)
        return out.at[jnp.arange(n)[:, None], idx].add(upd, mode="drop")

    out = scatter(out, x0, y0, wx0 * wy0)
    out = scatter(out, x0 + 1, y0, wx1 * wy0)
    out = scatter(out, x0, y0 + 1, wx0 * wy1)
    out = scatter(out, x0 + 1, y0 + 1, wx1 * wy1)
    return out.reshape(n, h, w, c).astype(ten_in.dtype)


def softsplat(
    ten_in: Array,
    flow: Array,
    metric: Array | None,
    mode: str,
    return_norm: bool = False,
):
    """Forward-splat with mode/eps handling (`softsplat.py:286-352`).

    mode: "sum" | "avg" | "linear[-eps]" | "softmax[-eps]" where eps is one of
    "addeps", "zeroeps", "clipeps" (default addeps).
    """
    base = mode.split("-")[0]
    assert base in ("sum", "avg", "linear", "softmax"), mode
    if base in ("sum", "avg"):
        assert metric is None
    else:
        assert metric is not None

    if base == "avg":
        ones = jnp.ones((*ten_in.shape[:3], 1), dtype=ten_in.dtype)
        ten_in = jnp.concatenate([ten_in, ones], axis=-1)
    elif base == "linear":
        ten_in = jnp.concatenate([ten_in * metric, metric], axis=-1)
    elif base == "softmax":
        m = jnp.exp(metric)
        ten_in = jnp.concatenate([ten_in * m, m], axis=-1)

    out = _splat_core(ten_in, flow)

    if base == "sum":
        return out

    norm = out[..., -1:]
    parts = mode.split("-")
    eps_policy = parts[1] if len(parts) > 1 else "addeps"
    if eps_policy == "addeps":
        norm = norm + _EPS
    elif eps_policy == "zeroeps":
        norm = jnp.where(norm == 0.0, 1.0, norm)
    elif eps_policy == "clipeps":
        norm = jnp.clip(norm, _EPS, None)
    else:
        raise ValueError(f"unknown eps policy: {mode}")

    if return_norm:
        return out[..., :-1], norm
    return out[..., :-1] / norm
