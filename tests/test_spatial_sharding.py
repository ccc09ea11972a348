"""Spatially-sharded inference matches the single-device result.

Shards the frame width over an 8-virtual-CPU 'space' mesh axis and checks the
GSPMD-partitioned pipeline (halo'd convs, sharded corr volume + INR matmuls)
against the unsharded forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R, interpolate_sequential
from gimmvfi_tpu.parallel.mesh import create_mesh
from gimmvfi_tpu.parallel.spatial import interpolate_spatial_sharded


def test_spatial_sharding_matches_single_device(rng):
    assert jax.device_count() >= 8
    mesh = create_mesh(jax.devices()[:8], data=1, space=8)

    model = GIMMVFI_R(raft_iters=2)
    h, w = 64, 128  # W=128 divides the 8-way space axis
    img = rng.random((1, 2, h, w, 3)).astype(np.float32)
    variables = dict(
        jax.jit(lambda r, x: model.init(r, x, (0.5,)))(
            jax.random.PRNGKey(0), jnp.asarray(img)
        )
    )
    ts = np.asarray([0.5], np.float32)

    ref = jax.device_get(
        jax.jit(
            lambda v, x, t: interpolate_sequential(model, v, x, t)
        )(variables, jnp.asarray(img), jnp.asarray(ts))["imgt_pred"]
    )

    out = interpolate_spatial_sharded(model, variables, img, ts, mesh)
    got = jax.device_get(out["imgt_pred"])

    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
