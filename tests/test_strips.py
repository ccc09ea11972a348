"""Vertical-strip space-to-batch (ops/strips.py) exactness.

A K-deep SAME 3x3 conv chain on 8 strips with a K-column halo must equal
the unsplit computation bit-for-bit in f32: halo columns carry the true
neighbor pixels, and each conv's zero-padding contamination stays inside
the remaining halo.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gimmvfi_tpu.ops.strips import from_strips, strip_worthwhile, to_strips


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _conv_chain(x, kernels):
    for k in kernels:
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jnp.maximum(x, 0.1 * x)  # leaky activation between convs
    return x


@pytest.mark.parametrize("depth", [1, 5, 17])
def test_strip_conv_chain_exact(rng, depth):
    n, h, w, c = 2, 10, 320, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    kernels = [
        jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
        for _ in range(depth)
    ]

    ref = _conv_chain(x, kernels)
    got = from_strips(_conv_chain(to_strips(x, depth), kernels), depth)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_roundtrip_identity(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 64, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(from_strips(to_strips(x, 3), 3)), np.asarray(x)
    )


def test_strip_worthwhile_gate():
    assert strip_worthwhile(1280, 8, 17)
    assert not strip_worthwhile(128, 8, 17)  # halo would dominate
    assert not strip_worthwhile(48, 8, 17)  # too narrow to split
