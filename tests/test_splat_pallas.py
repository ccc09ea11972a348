"""Pallas sorted-window splat == XLA scatter splat (interpret mode on CPU).

The Pallas kernel is the TPU fast path for softsplat's forward scatter;
`interpret=True` runs the same kernel logic through the Pallas interpreter
so the routing/windowing/carry machinery is verified on every platform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gimmvfi_tpu.ops.softsplat import _splat_core
from gimmvfi_tpu.ops.splat_pallas import splat_corners_sorted


@pytest.mark.parametrize(
    "shape,flow_scale",
    [
        ((1, 16, 24, 5), 3.0),
        ((2, 24, 16, 3), 30.0),  # displacements far beyond the frame
        ((1, 8, 8, 1), 0.6),
    ],
)
def test_pallas_splat_matches_xla(rng, shape, flow_scale):
    n, h, w, c = shape
    vals = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    flow = jnp.asarray(
        rng.standard_normal((n, h, w, 2)) * flow_scale, jnp.float32
    )

    ref = _splat_core(vals, flow)
    got = splat_corners_sorted(vals, flow, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_splat_nonfinite_dropped(rng):
    n, h, w, c = 1, 16, 16, 2
    vals = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32)
    flow = flow.at[0, 3, 4, 0].set(jnp.nan)
    flow = flow.at[0, 5, 6, 1].set(jnp.inf)

    ref = _splat_core(vals, flow)
    got = splat_corners_sorted(vals, flow, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_bwd_matches_xla_autodiff(rng):
    """The hand-written gather VJP equals XLA autodiff of the scatter path."""
    from gimmvfi_tpu.ops.softsplat import _splat_core_xla, _splat_pallas_bwd

    n, h, w, c = 2, 12, 18, 4
    vals = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)) * 4.0, jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    _, vjp = jax.vjp(_splat_core_xla, vals, flow)
    ref_dv, ref_df = vjp(g)
    got_dv, got_df = _splat_pallas_bwd((vals, flow), g)

    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(ref_dv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_df), np.asarray(ref_df),
                               rtol=1e-5, atol=1e-5)
