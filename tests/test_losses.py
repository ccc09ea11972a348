"""Loss parity vs torch transcriptions of src/utils/loss.py."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gimmvfi_tpu.train import losses


def _gauss_kernel(channels):
    k = torch.tensor(
        [
            [1.0, 4.0, 6.0, 4.0, 1],
            [4.0, 16.0, 24.0, 16.0, 4.0],
            [6.0, 24.0, 36.0, 24.0, 6.0],
            [4.0, 16.0, 24.0, 16.0, 4.0],
            [1.0, 4.0, 6.0, 4.0, 1.0],
        ]
    ) / 256.0
    return k.repeat(channels, 1, 1, 1)


def _conv_gauss(img, kernel):
    img = F.pad(img, (2, 2, 2, 2), mode="reflect")
    return F.conv2d(img, kernel, groups=img.shape[1])


def _upsample(x):
    cc = torch.cat([x, torch.zeros_like(x)], dim=3)
    cc = cc.view(x.shape[0], x.shape[1], x.shape[2] * 2, x.shape[3])
    cc = cc.permute(0, 1, 3, 2)
    cc = torch.cat(
        [cc, torch.zeros(x.shape[0], x.shape[1], x.shape[3], x.shape[2] * 2)], dim=3
    )
    cc = cc.view(x.shape[0], x.shape[1], x.shape[3] * 2, x.shape[2] * 2)
    return _conv_gauss(cc.permute(0, 1, 3, 2), 4 * _gauss_kernel(x.shape[1]))


def torch_lap_loss(a, b, max_levels=5):
    k = _gauss_kernel(a.shape[1])

    def pyramid(img):
        current, pyr = img, []
        for _ in range(max_levels):
            filtered = _conv_gauss(current, k)
            down = filtered[:, :, ::2, ::2]
            pyr.append(current - _upsample(down))
            current = down
        return pyr

    return sum(F.l1_loss(x, y) for x, y in zip(pyramid(a), pyramid(b)))


def torch_census(x, y, patch_size=7):
    out_channels = patch_size * patch_size
    w = np.eye(out_channels).reshape((patch_size, patch_size, 1, out_channels))
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()

    def transform(t):
        t_ = t.mean(dim=1, keepdim=True)
        patches = F.conv2d(t_, w, padding=patch_size // 2, bias=None)
        loc_diff = patches - t_
        return loc_diff / torch.sqrt(0.81 + loc_diff**2)

    dx = transform(x)
    dy = transform(y).detach()
    diff = dx - dy
    dist = (diff**2 / (0.1 + diff**2)).mean(dim=1, keepdim=True)
    pad = patch_size // 2
    b, c, h, wd = x.size()
    inner = torch.ones(b, 1, h - 2 * pad, wd - 2 * pad)
    mask = F.pad(inner, [pad] * 4)
    return (dist * mask).mean()


@pytest.fixture
def pair(rng):
    a = rng.random((2, 64, 64, 3), dtype=np.float32)
    b = rng.random((2, 64, 64, 3), dtype=np.float32)
    ta = torch.from_numpy(a.transpose(0, 3, 1, 2).copy())
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2).copy())
    return a, b, ta, tb


def test_lap_loss(pair):
    a, b, ta, tb = pair
    ref = torch_lap_loss(ta, tb)
    out = losses.lap_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5)


def test_census_loss(pair):
    a, b, ta, tb = pair
    ref = torch_census(ta, tb)
    out = losses.census_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(out), float(ref), atol=1e-6)


def test_charbonnier(pair):
    a, b, ta, tb = pair
    ref = ((ta - tb).pow(2) + 1e-6).sqrt().mean()
    out = losses.charbonnier_l1(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(out), float(ref), atol=1e-7)


def test_psnr(pair):
    a, b, _, _ = pair
    mse = ((a - b) ** 2).reshape(2, -1).mean(-1)
    ref = (-10 * np.log10(mse)).mean()
    out = losses.psnr(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)
