"""HypoNet: the coordinate-based SIREN MLP decoding flow at (x, y, t).

Rebuilds `modules/hyponet.py` as a flax module. Parameters are stored per
layer as a single (fan_in+1, fan_out) matrix whose last row is the bias —
the reference's ParameterDict layout (`hyponet.py:148-186`) — so checkpoint
conversion is a direct copy.

The forward is one flattened (B, P, D) x (D, F) matmul chain over all
coordinates — MXU-shaped; the per-pixel latent is bilinearly resampled to the
coordinate grid and concatenated with the (t, y, x) coordinate
(`hyponet.py:86-95`). Weight columns are L2-normalized over fan_in when
`normalize_weight` (`hyponet.py:127-128`). Optional per-layer modulation
masks multiply the weight before normalization (`hyponet.py:105-136`);
the released GIMM-VFI paths never pass them, so `modulations=None` is the
hot path.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import damping, sine
from ..ops.interp import resize_bilinear

Array = jax.Array


def _siren_init(fan_in: int, w0: float, is_first: bool):
    """SIREN uniform bound (`modules/utils.py:37-44`)."""
    if is_first:
        return 1.0 / fan_in
    return math.sqrt(6.0 / fan_in) / w0


class HypoNet(nn.Module):
    n_layer: int = 5
    hidden_dim: int = 128
    input_dim: int = 3
    output_dim: int = 2
    output_bias: float = 0.5
    siren_w0: float = 1.0
    add_coord_dim: int = 32
    normalize_weight: bool = True
    use_bias: bool = True
    # HypoNetConfig.activation.type (`modules/module_config.py:16-41`):
    # "sine" on every released config; "damping" kept for config parity
    # (`modules/layers.py:28-42`)
    activation: str = "sine"

    def layer_shapes(self) -> list[tuple[int, int]]:
        shapes = []
        fan_in = self.input_dim + self.add_coord_dim + 1
        for _ in range(self.n_layer - 1):
            shapes.append((fan_in, self.hidden_dim))
            fan_in = self.hidden_dim + 1
        shapes.append((fan_in, self.output_dim))
        return shapes

    def _make_param(self, idx: int, shape: tuple[int, int]) -> Array:
        is_first = idx == 0
        fan_in = shape[0] - 1

        def init(key):
            kw, kb = jax.random.split(key)
            wb = _siren_init(fan_in, self.siren_w0, is_first)
            # the reference initializes the bias row with the *bias tensor's*
            # fan_in of 1 (`modules/utils.py:50-62`)
            bb = _siren_init(1, self.siren_w0, is_first)
            w = jax.random.uniform(kw, (fan_in, shape[1]), jnp.float32, -wb, wb)
            b = jax.random.uniform(kb, (1, shape[1]), jnp.float32, -bb, bb)
            return jnp.concatenate([w, b], axis=0)

        return self.param(f"linear_wb{idx}", init)

    @nn.compact
    def __call__(
        self,
        coord: Array,
        pixel_latent: Array,
        sub_idx: Optional[Array] = None,
        modulations: Optional[dict] = None,
    ) -> Array:
        """coord: (B, T, H, W, D); pixel_latent: (B, h, w, L).

        sub_idx: optional (B, K) int32 indices into the flattened (T*H*W)
        coordinate axis (coordinate subsampling for supervision,
        `hyponet.py:58-69`). Returns (B, T, H, W, output_dim) or (B, K, out).
        """
        b = coord.shape[0]
        coord_shape = coord.shape[1:-1]
        t_dim, h, w = coord_shape

        lat = resize_bilinear(pixel_latent, (h, w), align_corners=False)
        lat = jnp.broadcast_to(lat[:, None], (b, t_dim, h, w, lat.shape[-1]))

        hidden = jnp.concatenate(
            [lat.reshape(b, -1, lat.shape[-1]), coord.reshape(b, -1, coord.shape[-1])],
            axis=-1,
        )

        if sub_idx is not None:
            hidden = jnp.take_along_axis(hidden, sub_idx[..., None], axis=1)

        shapes = self.layer_shapes()
        for idx, shape in enumerate(shapes):
            wb = self._make_param(idx, shape)
            param_w, param_b = wb[:-1], wb[-1:]
            if modulations is not None and f"linear_wb{idx}" in modulations:
                param_w = param_w[None] * modulations[f"linear_wb{idx}"]
                if self.normalize_weight:
                    norm = jnp.linalg.norm(param_w, axis=1, keepdims=True)
                    param_w = param_w / jnp.maximum(norm, 1e-12)
                hidden = jnp.einsum("bpd,bdf->bpf", hidden, param_w) + param_b
            else:
                if self.normalize_weight:
                    norm = jnp.linalg.norm(param_w, axis=0, keepdims=True)
                    param_w = param_w / jnp.maximum(norm, 1e-12)
                hidden = (
                    jnp.einsum(
                        "bpd,df->bpf",
                        hidden,
                        param_w,
                        preferred_element_type=jnp.float32,
                    )
                    + param_b
                )
            if idx < self.n_layer - 1:
                if self.activation == "sine":
                    act = sine
                elif self.activation == "damping":
                    act = damping
                else:
                    raise ValueError(
                        f"unknown HypoNet activation {self.activation!r}; "
                        "expected 'sine' or 'damping'"
                    )
                hidden = act(hidden, self.siren_w0)

        out = hidden + self.output_bias
        if sub_idx is None:
            out = out.reshape(b, *coord_shape, self.output_dim)
        return out
