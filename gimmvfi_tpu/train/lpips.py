"""LPIPS perceptual metric (AlexNet backbone + linear heads) — flax, NHWC.

Rebuilds the reference's vendored LPIPS (`src/utils/lpips/lpips.py:39-190`,
`pretrained_networks.py:70-110`): torchvision-AlexNet feature slices
(relu1..relu5), per-layer channel-L2 feature normalization, squared diffs,
1x1 no-bias linear heads, spatial mean, sum over layers.

Used both as a training loss ("-P" recipes, `trainer_gimmvfi.py:259-305`) and
as the benchmark metric next to PSNR (`X4K.py:160-197`). `calc_lpips`
replicates the reference's 8-bit quantization before the metric
(`lpips/__init__.py:21-28`).

Weights come from `utils/convert.convert_lpips` (reference `alex.pth` linear
heads + a torchvision alexnet state dict).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# ScalingLayer constants (`lpips.py:192-203`)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _max_pool_3x3s2(x: Array) -> Array:
    """torch MaxPool2d(kernel_size=3, stride=2): no padding, floor division."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features` sliced at every ReLU the LPIPS metric
    taps (`pretrained_networks.py:70-110`). NHWC.

    Returns [relu1 (64ch), relu2 (192), relu3 (384), relu4 (256), relu5 (256)].
    """

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        from ..nn.layers import Conv2d

        outs = []
        h = nn.relu(Conv2d(64, 11, 4, 2, name="conv0")(x))
        outs.append(h)
        h = _max_pool_3x3s2(h)
        h = nn.relu(Conv2d(192, 5, 1, 2, name="conv3")(h))
        outs.append(h)
        h = _max_pool_3x3s2(h)
        h = nn.relu(Conv2d(384, 3, 1, 1, name="conv6")(h))
        outs.append(h)
        h = nn.relu(Conv2d(256, 3, 1, 1, name="conv8")(h))
        outs.append(h)
        h = nn.relu(Conv2d(256, 3, 1, 1, name="conv10")(h))
        outs.append(h)
        return outs


def _normalize_channels(feat: Array, eps: float = 1e-10) -> Array:
    """Unit-L2 over channels; eps ADDED to the norm (`lpips/__init__.py:31`)."""
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance. Inputs NHWC in [-1, 1] (or [0, 1] with
    normalize=True). Returns (N, 1, 1, 1) per-sample distances."""

    @nn.compact
    def __call__(self, in0: Array, in1: Array, normalize: bool = False) -> Array:
        if normalize:  # [0,1] -> [-1,1] (`lpips.py:125-130`)
            in0 = 2.0 * in0 - 1.0
            in1 = 2.0 * in1 - 1.0

        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        net = AlexNetFeatures(name="net")
        outs0 = net((in0 - shift) / scale)
        outs1 = net((in1 - shift) / scale)

        total = 0.0
        for kk, (f0, f1) in enumerate(zip(outs0, outs1)):
            d = (_normalize_channels(f0) - _normalize_channels(f1)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{kk}")(d)
            total = total + w.mean(axis=(1, 2), keepdims=True)
        return total


def calc_lpips(model: LPIPS, variables, gt: Array, pred: Array) -> Array:
    """Benchmark metric: quantize both images to 8-bit first
    (`lpips/__init__.py:21-28`). gt/pred: NHWC in [0, 1]."""

    def quantize(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0

    return model.apply(variables, quantize(gt), quantize(pred), normalize=True)
