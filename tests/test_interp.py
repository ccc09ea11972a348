"""Ops parity vs torch-CPU goldens: grid_sample / warp / resize / pooling."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gimmvfi_tpu import ops


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(rng, padding_mode, align_corners):
    img = rng.standard_normal((2, 9, 13, 3), dtype=np.float32)
    grid = (rng.random((2, 5, 7, 2), dtype=np.float32) * 2.8 - 1.4).astype(np.float32)

    ref = F.grid_sample(
        nchw(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    out = ops.grid_sample(
        jnp.asarray(img),
        jnp.asarray(grid),
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_warp_matches_reference_semantics(rng):
    """warp == grid_sample(border, align_corners=True) at pixel offsets."""
    img = rng.standard_normal((2, 8, 12, 4), dtype=np.float32)
    flow = (rng.standard_normal((2, 8, 12, 2)) * 3).astype(np.float32)

    # torch reimplementation of fi_utils.warp (the reference formula)
    t_img, t_flow = nchw(img), nchw(flow)
    h, w = 8, 12
    gx = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(2, -1, h, -1)
    gy = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(2, -1, -1, w)
    grid = torch.cat([gx, gy], 1)
    nf = torch.cat(
        [t_flow[:, 0:1] / ((w - 1) / 2), t_flow[:, 1:2] / ((h - 1) / 2)], 1
    )
    g = (grid + nf).permute(0, 2, 3, 1)
    ref = F.grid_sample(
        t_img, g, mode="bilinear", padding_mode="border", align_corners=True
    )

    out = ops.warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_bilinear_sampler_matches_raft(rng):
    """RAFT's pixel-coord sampler (zeros padding, align_corners=True)."""
    img = rng.standard_normal((3, 10, 11, 2), dtype=np.float32)
    coords = (rng.random((3, 4, 5, 2)) * 14 - 2).astype(np.float32)

    h, w = 10, 11
    xg = torch.from_numpy(coords[..., 0:1])
    yg = torch.from_numpy(coords[..., 1:2])
    grid = torch.cat([2 * xg / (w - 1) - 1, 2 * yg / (h - 1) - 1], dim=-1)
    ref = F.grid_sample(nchw(img), grid, align_corners=True)

    out = ops.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,scale,align",
    [
        ((16, 24), 0.25, False),
        ((16, 24), 0.5, False),
        ((8, 12), 2.0, False),
        ((8, 12), 4.0, False),
        ((9, 13), 0.5, False),
        ((8, 12), 2.0, True),
        ((4, 6), 8.0, True),
    ],
)
def test_resize_matches_torch(rng, in_hw, scale, align):
    img = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ref = F.interpolate(
        nchw(img), scale_factor=scale, mode="bilinear", align_corners=align
    )
    out = ops.resize(jnp.asarray(img), scale, align_corners=align)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_resize_to_size_matches_torch(rng):
    img = rng.standard_normal((1, 7, 9, 2), dtype=np.float32)
    ref = F.interpolate(nchw(img), size=(13, 5), mode="bilinear")
    out = ops.resize_bilinear(jnp.asarray(img), (13, 5), align_corners=False)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-5)


def test_upflow8_matches_torch(rng):
    flow = rng.standard_normal((2, 6, 8, 2), dtype=np.float32)
    t = nchw(flow)
    ref = 8 * F.interpolate(t, size=(48, 64), mode="bilinear", align_corners=True)
    out = ops.upflow8(jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-4)


@pytest.mark.parametrize("hw", [(8, 12), (9, 13)])
def test_avg_pool2x2_matches_torch(rng, hw):
    x = rng.standard_normal((2, *hw, 5), dtype=np.float32)
    ref = F.avg_pool2d(nchw(x), 2, stride=2)
    out = ops.avg_pool2x2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=1e-6)


def test_input_padder_matches_torch(rng):
    x = rng.standard_normal((1, 30, 50, 3), dtype=np.float32)
    padder = ops.InputPadder(x.shape, divisor=32)
    out = padder.pad(jnp.asarray(x))
    assert out.shape[1] % 32 == 0 and out.shape[2] % 32 == 0

    ref = F.pad(nchw(x), [7, 7, 1, 1], mode="replicate")
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), atol=0)

    back = padder.unpad(out)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_normalize_unnormalize_roundtrip(rng):
    flows = rng.standard_normal((2, 2, 6, 8, 2)).astype(np.float32) * 17
    nf, sc = ops.normalize_flow(jnp.asarray(flows))
    assert np.asarray(nf).max() <= 1.0 + 1e-6 and np.asarray(nf).min() >= -1e-6
    rt = ops.unnormalize_flow(nf, sc)
    np.testing.assert_allclose(np.asarray(rt), flows, atol=1e-4)


@pytest.mark.parametrize("c,dtype", [(3, "bfloat16"), (4, "bfloat16"), (3, "float32"), (4, "float32")])
def test_quad_gather_fast_paths_bit_exact(rng, c, dtype):
    """The packed-bf16 / f32-pair-row gather rescues (ops/interp.py) must be
    bit-identical to the generic 4C-lane take path (which C>=5 still uses):
    they move the same bits, only in differently shaped rows."""
    from gimmvfi_tpu.ops.interp import quad_gather

    img = rng.standard_normal((2, 9, 13, c), dtype=np.float32)
    imgx = jnp.asarray(img).astype(dtype)
    # wide twin: extra channels force the generic path; slice back after
    wide = jnp.concatenate([imgx] * 3, axis=-1)[..., : c + 2 * c]
    ix0 = jnp.asarray(rng.integers(-3, 16, (2, 40)), jnp.int32)
    iy0 = jnp.asarray(rng.integers(-3, 12, (2, 40)), jnp.int32)

    for mode in ("border", "zeros"):
        fast = quad_gather(imgx, ix0, iy0, mode)
        generic = quad_gather(wide, ix0, iy0, mode)[..., :c]
        np.testing.assert_array_equal(
            np.asarray(fast.astype(jnp.float32)),
            np.asarray(generic.astype(jnp.float32)),
        )


@pytest.mark.parametrize("in_hw,scale", [
    ((33, 47), 3.0), ((21, 13), 2.5), ((40, 56), 0.3),
    ((17, 29), 7.0), ((64, 48), 1.5),
])
def test_tent_matmul_matches_gather_formulation(rng, in_hw, scale):
    """The two resize formulations (trace-time tent matrix vs runtime gather)
    must pick identical floor indices even at ULP boundaries for non-dyadic
    scales (identical f32 arithmetic in both helpers)."""
    from gimmvfi_tpu.ops import interp as interp_ops

    x = jnp.asarray(rng.standard_normal((2, *in_hw, 3)), jnp.float32)
    saved = interp_ops._TENT_MATMUL_MAX
    try:
        interp_ops._TENT_MATMUL_MAX = 1 << 40
        via_matmul = interp_ops.resize(x, scale)
        interp_ops._TENT_MATMUL_MAX = -1
        via_gather = interp_ops.resize(x, scale)
    finally:
        interp_ops._TENT_MATMUL_MAX = saved
    np.testing.assert_allclose(
        np.asarray(via_matmul), np.asarray(via_gather), rtol=0, atol=1e-5
    )
