"""Correlation volume + pyramid lookup parity vs torch goldens
(torch transcription of raft/corr.py CorrBlock/BidirCorrBlock)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gimmvfi_tpu.ops import corr as corr_ops


def torch_bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def torch_corr_block(fmap1, fmap2, coords, num_levels=4, radius=4):
    """Golden CorrBlock: fmaps NCHW, coords (N,2,H,W) pixel (x,y)."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2).view(batch, ht, wd, 1, ht, wd)
    corr = corr / torch.sqrt(torch.tensor(dim).float())
    corr = corr.reshape(batch * ht * wd, 1, ht, wd)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    coords = coords.permute(0, 2, 3, 1)
    b, h1, w1, _ = coords.shape
    out_pyramid = []
    for i, c in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(b * h1 * w1, 1, 1, 2) / 2**i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        sampled = torch_bilinear_sampler(c, coords_lvl)
        out_pyramid.append(sampled.view(b, h1, w1, -1))
    return torch.cat(out_pyramid, dim=-1).permute(0, 3, 1, 2)


def test_all_pairs_corr(rng):
    f1 = rng.standard_normal((2, 6, 8, 16), dtype=np.float32)
    f2 = rng.standard_normal((2, 6, 8, 16), dtype=np.float32)
    out = corr_ops.all_pairs_corr(jnp.asarray(f1), jnp.asarray(f2))

    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2).copy())
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2).copy())
    b, d = 2, 16
    ref = torch.matmul(
        t1.reshape(b, d, -1).transpose(1, 2), t2.reshape(b, d, -1)
    ) / np.sqrt(d)
    np.testing.assert_allclose(
        np.asarray(out).reshape(2, 48, 48), ref.numpy(), atol=1e-4
    )


def test_corr_lookup_matches_torch(rng):
    h, w, c = 16, 16, 12
    f1 = rng.standard_normal((1, h, w, c), dtype=np.float32)
    f2 = rng.standard_normal((1, h, w, c), dtype=np.float32)
    coords = (rng.random((1, h, w, 2), dtype=np.float32) * (w + 4) - 2).astype(
        np.float32
    )

    pyr = corr_ops.corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    out = corr_ops.corr_lookup(pyr, jnp.asarray(coords), radius=4)

    ref = torch_corr_block(
        torch.from_numpy(f1.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(f2.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(coords.transpose(0, 3, 1, 2).copy()),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_bidir_corr_matches_two_torch_blocks(rng):
    """BidirCorrBlock == (CorrBlock(f1,f2) @ coords0, CorrBlock(f2,f1) @ coords1).

    The transposed volume with its own pyramid is exactly the all-pairs
    correlation of (fmap2, fmap1) — raft/corr.py:23-44.
    """
    # >= 16 so the coarsest pyramid level is >= 2x2 (the reference's
    # bilinear_sampler divides by size-1 and NaNs on 1x1 levels)
    h, w, c = 16, 16, 6
    f1 = rng.standard_normal((1, h, w, c), dtype=np.float32)
    f2 = rng.standard_normal((1, h, w, c), dtype=np.float32)
    coords0 = (rng.random((1, h, w, 2)) * w).astype(np.float32)
    coords1 = (rng.random((1, h, w, 2)) * w).astype(np.float32)

    pyrs = corr_ops.bidir_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    out0, out1 = corr_ops.bidir_corr_lookup(
        pyrs, jnp.asarray(coords0), jnp.asarray(coords1), radius=4
    )

    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2).copy())
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2).copy())
    tc0 = torch.from_numpy(coords0.transpose(0, 3, 1, 2).copy())
    tc1 = torch.from_numpy(coords1.transpose(0, 3, 1, 2).copy())
    ref0 = torch_corr_block(t1, t2, tc0)
    ref1 = torch_corr_block(t2, t1, tc1)
    np.testing.assert_allclose(
        np.asarray(out0), ref0.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1), ref1.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


@pytest.mark.parametrize("radius,levels", [(4, 4), (3, 2), (1, 1)])
def test_windowed_matches_materialized(rng, radius, levels):
    """The lazy / memory-efficient lookup (alt_cuda_corr equivalent,
    reference correlation_kernel.cu:18-119) must equal the materialized
    pyramid lookup: pooling and window sampling are linear in the volume,
    which is linear in fmap2."""
    n, h, w, c = 2, 12, 17, 32
    f1 = rng.standard_normal((n, h, w, c), dtype=np.float32)
    f2 = rng.standard_normal((n, h, w, c), dtype=np.float32)
    # coords spanning in-bounds, sub-pixel, and far out-of-bounds
    coords = (rng.random((n, h, w, 2)) * (w + 14) - 7).astype(np.float32)

    pyr = corr_ops.corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels)
    ref = corr_ops.corr_lookup(pyr, jnp.asarray(coords), radius)

    wc = corr_ops.windowed_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels)
    got = corr_ops.windowed_corr_lookup(wc, jnp.asarray(coords), radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_corr_pyramid_auto_dispatch(rng):
    """Static volume-size gate: small -> materialized, tiny cap -> windowed;
    lookups agree through the dispatcher."""
    n, h, w, c = 1, 10, 11, 16
    f1 = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    coords = jnp.asarray((rng.random((n, h, w, 2)) * w).astype(np.float32))

    small = corr_ops.corr_pyramid_auto(f1, f2)
    assert isinstance(small, corr_ops.CorrPyramid)
    capped = corr_ops.corr_pyramid_auto(f1, f2, max_volume_bytes=1024)
    assert isinstance(capped, corr_ops.WindowedCorr)
    np.testing.assert_allclose(
        np.asarray(corr_ops.corr_lookup_any(capped, coords)),
        np.asarray(corr_ops.corr_lookup_any(small, coords)),
        atol=2e-5,
    )


def test_windowed_amt_synthesis_parity(rng):
    """Model-level: forcing the memory-efficient windowed correlation through
    BOTH the RAFT loop and the AMT synthesis lookups (corr_max_volume_bytes=0)
    must reproduce the materialized-path interpolation to float tolerance
    (the alt_cuda_corr scenario, reference correlation_kernel.cu:18-119
    consumed via BidirCorrBlock at gimmvfi_r.py:133)."""
    import jax

    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R

    img_xs = jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32))
    mat = GIMMVFI_R(raft_iters=2)
    win = GIMMVFI_R(raft_iters=2, corr_max_volume_bytes=0)
    variables = jax.jit(lambda r, x: mat.init(r, x, (0.5,)))(
        jax.random.PRNGKey(0), img_xs
    )

    out_m = jax.jit(
        lambda v, x: mat.apply(v, x, (0.5,), method=mat.interpolate)
    )(variables, img_xs)
    out_w = jax.jit(
        lambda v, x: win.apply(v, x, (0.5,), method=win.interpolate)
    )(variables, img_xs)

    np.testing.assert_allclose(
        np.asarray(out_w["imgt_pred"][0]),
        np.asarray(out_m["imgt_pred"][0]),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_w["flowt"][0]), np.asarray(out_m["flowt"][0]), atol=5e-4
    )
