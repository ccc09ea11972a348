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


def test_multiflow_decoder_strips_equivalence(rng):
    """Model-level guard for the halo constant: the strided MultiFlowDecoder
    (space-to-batch strips) must equal the unsplit computation bit-for-bit.
    If a conv is added to the decoder stack without bumping
    _DECODER_STACK_DEPTH, this fails."""
    from gimmvfi_tpu.models.synthesis import MultiFlowDecoder
    from gimmvfi_tpu.ops import strips as strips_ops

    n, hf, wf = 1, 16, 272  # smallest width passing strip_worthwhile
    h4, w4 = hf // 4, wf // 4
    dec = MultiFlowDecoder(16, 8, 3)
    ft_ = jnp.asarray(rng.standard_normal((n, h4, w4, 16)), jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((n, hf, wf, 8)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((n, hf, wf, 8)), jnp.float32)
    flow0 = jnp.asarray(rng.standard_normal((n, h4, w4, 2)), jnp.float32)
    flow1 = jnp.asarray(rng.standard_normal((n, h4, w4, 2)), jnp.float32)
    mask = jnp.asarray(rng.standard_normal((n, h4, w4, 1)), jnp.float32)
    img0 = jnp.asarray(rng.random((n, hf, wf, 3)), jnp.float32)
    img1 = jnp.asarray(rng.random((n, hf, wf, 3)), jnp.float32)

    args = (ft_, f0, f1, flow0, flow1, mask, img0, img1)
    variables = dec.init(jax.random.PRNGKey(0), *args)

    assert strips_ops.ENABLED
    with_strips = dec.apply(variables, *args)
    try:
        strips_ops.ENABLED = False
        unsplit = dec.apply(variables, *args)
    finally:
        strips_ops.ENABLED = True

    for a, b in zip(with_strips, unsplit):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
