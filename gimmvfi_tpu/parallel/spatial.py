"""Spatial sharding for high-resolution single-pair inference.

The reference scales resolution with DS_SCALE + a V100's 16-32GB of HBM
(README.md:93-97); the TPU-native scaling axis is the device mesh: shard the
frame WIDTH over the mesh's 'space' axis and let GSPMD partition the whole
interpolation pipeline — convolutions get halo exchanges, the all-pairs
correlation volume and the HypoNet token matmuls shard over query rows, and
parameters stay replicated. This is the "context parallelism" analog named in
SURVEY.md §5 (long-context == spatial resolution here).

Works with any model exposing prepare/decode_one (GIMM-VFI-R and -F).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gimmvfi_r import interpolate_sequential
from .mesh import replicate


@functools.lru_cache(maxsize=16)
def _jitted_interp(model, ds_factor):
    """One compiled fn per (model, ds) — a fresh jit wrapper per call would
    re-trace every invocation (the video-loop footgun)."""
    return jax.jit(
        lambda v, x, ts: interpolate_sequential(model, v, x, ts, ds_factor)
    )


def interpolate_spatial_sharded(
    model,
    variables,
    img_xs,
    t_values,
    mesh: Mesh,
    ds_factor: float | None = None,
    axis: str = "space",
):
    """Nx interpolation with the W axis sharded over `axis`.

    img_xs: (N, 2, H, W, 3) host or device array. W is padded (edge
    replicate, the convention the eval padders use) up to a multiple of the
    axis size and outputs are cropped back, so any width works. Returns the
    same stacked dict as `interpolate_sequential`, with outputs sharded the
    same way (device_get to materialize on host).
    """
    import math

    img_xs = jnp.asarray(img_xs)
    w = img_xs.shape[3]
    n_dev = mesh.shape[axis]
    # pad to a multiple of lcm(axis, 8): shardable AND still a valid model
    # width (the /8 feature pyramid)
    mult = math.lcm(n_dev, 8)
    w_pad = -(-w // mult) * mult - w
    if w_pad:
        img_xs = jnp.pad(
            img_xs, [(0, 0), (0, 0), (0, 0), (0, w_pad), (0, 0)], mode="edge"
        )

    x_sharding = NamedSharding(mesh, P(None, None, None, axis, None))
    img_xs = jax.device_put(img_xs, x_sharding)
    variables = replicate(mesh, variables)

    fn = _jitted_interp(model, ds_factor)
    with mesh:
        out = fn(variables, img_xs, jnp.asarray(t_values, jnp.float32))
    if w_pad:
        # crop each output by its OWN width semantics, not a shape heuristic:
        # imgt_pred is full-res (crop to w), flowt is working-res (crop to
        # the valid prefix of the downscaled padded width)
        ds = 1.0 if ds_factor is None else ds_factor
        crops = {"imgt_pred": w, "flowt": int(w * ds)}
        out = {
            k: (v[..., : crops[k], :] if k in crops else v)
            for k, v in out.items()
        }
    return out
