"""Coordinate grids and flow normalization helpers.

Reference semantics: `fi_utils.py:52-82`, `raft/utils/utils.py:83-88`,
`modules/coord_sampler.py`.  All channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def coords_grid(batch: int, ht: int, wd: int) -> Array:
    """(N, H, W, 2) float grid of (x, y) pixel coordinates."""
    y, x = jnp.meshgrid(
        jnp.arange(ht, dtype=jnp.float32),
        jnp.arange(wd, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([x, y], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def normalize_flow(flows: Array) -> tuple[Array, Array]:
    """Per-sample max-abs normalize bidirectional flows to [0, 1].

    flows: (N, T, H, W, 2) (reference uses (N, 2, T, H, W) —
    `fi_utils.py:52-60`). Returns (normalized flows in [0, 1],
    scaler of shape (N, 1, 1, 1, 1)).
    """
    n = flows.shape[0]
    scaler = jnp.max(jnp.abs(flows.reshape(n, -1)), axis=-1)
    scaler = scaler.reshape(n, 1, 1, 1, 1)
    out = flows / scaler
    return (out + 1.0) / 2.0, scaler


def unnormalize_flow(flows: Array, flow_scaler: Array) -> Array:
    """Inverse of normalize_flow (`fi_utils.py:63-64`)."""
    return (flows * 2.0 - 1.0) * flow_scaler


def sample_coords_3d(
    batch_size: int,
    spatial_shape: tuple[int, int],
    t_values,
    coord_range: tuple[float, float] = (-1.0, 1.0),
    upsample_ratio: float = 1.0,
) -> Array:
    """Build normalized (t, y, x) coordinate grids for the motion INR.

    Mirrors `CoordSampler3D.shape2coordinate` / `batchshape2coordinate`
    (`modules/coord_sampler.py:21-69`): spatial coords are pixel-centered
    `coord_range[0] + (range span) * (0.5 + i)/n`; the time channel carries the
    raw timestep.

    t_values: scalar, (T,) array (shared across batch → output (B, T, H, W, 3)),
    or (B,) array (per-sample t → output (B, 1, H, W, 3)).
    """
    h, w = spatial_shape
    h = int(h * upsample_ratio)
    w = int(w * upsample_ratio)
    lo, hi = coord_range

    ys = lo + (hi - lo) * (0.5 + jnp.arange(h, dtype=jnp.float32)) / h
    xs = lo + (hi - lo) * (0.5 + jnp.arange(w, dtype=jnp.float32)) / w
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    t_values = jnp.asarray(t_values, dtype=jnp.float32)
    if t_values.ndim == 0:
        t_values = t_values[None]

    # (T, H, W, 3): channel order (t, y, x) as in the reference meshgrid
    tt = jnp.broadcast_to(t_values[:, None, None], (t_values.shape[0], h, w))
    sp_y = jnp.broadcast_to(yy[None], tt.shape)
    sp_x = jnp.broadcast_to(xx[None], tt.shape)
    coords = jnp.stack([tt, sp_y, sp_x], axis=-1)
    return jnp.broadcast_to(coords[None], (batch_size, *coords.shape))


def sample_coords_3d_per_sample(
    t_values: Array,
    spatial_shape: tuple[int, int],
    coord_range: tuple[float, float] = (-1.0, 1.0),
    upsample_ratio: float = 1.0,
) -> Array:
    """Per-sample timesteps: t_values (B,) -> coords (B, 1, H, W, 3)."""
    b = t_values.shape[0]
    base = sample_coords_3d(1, spatial_shape, jnp.float32(1.0), coord_range, upsample_ratio)
    base = jnp.broadcast_to(base, (b, *base.shape[1:]))
    t = t_values.reshape(b, 1, 1, 1).astype(jnp.float32)
    return jnp.concatenate(
        [base[..., :1] * t[..., None], base[..., 1:]], axis=-1
    )
