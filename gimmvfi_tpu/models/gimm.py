"""GIMM: stage-1 generalizable implicit motion model (flow-only).

Rebuilds `gimm.py`: encode two normalized flows, forward-splat the latents to
time t, fuse with a residual refiner, decode flow at arbitrary (x, y, t) with
the SIREN HypoNet. Trained standalone on precomputed flow triplets
(`datasets/flow_dataset.py`) before GIMM-VFI fine-tuning.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.coords import sample_coords_3d
from .gimm_core import LatentRefiner, MotionEncoder, splat_fuse_latents, splatting_weights
from .hyponet import HypoNet

Array = jax.Array


class GIMM(nn.Module):
    fwarp_type: str = "linear"
    coord_range: tuple[float, float] = (-1.0, 1.0)
    # remat=True bounds backward-pass temps to one encoder/refiner block
    # (the stage-1 recipe — bs 32 at 256^2, `configs/gimm/gimm.yaml:38-57` —
    # otherwise overflows a 16 GB v5e by ~45 MB with 1.8 GB fragmentation).
    # Same param tree either way; inference default stays remat-free like
    # the synthesis decoders (models/synthesis.py:_block_classes).
    remat: bool = False

    def setup(self):
        enc_cls = nn.remat(MotionEncoder) if self.remat else MotionEncoder
        ref_cls = nn.remat(LatentRefiner) if self.remat else LatentRefiner
        self.cnn_encoder = enc_cls()
        self.res_conv = ref_cls()
        self.hyponet = HypoNet(
            n_layer=5,
            hidden_dim=128,
            input_dim=3,
            output_dim=2,
            output_bias=0.5,
            siren_w0=1.0,
            add_coord_dim=32,
        )
        self.alpha_v = self.param("alpha_v", lambda k: jnp.ones((1,), jnp.float32))
        self.alpha_fe = self.param("alpha_fe", lambda k: jnp.ones((1,), jnp.float32))

    def __call__(
        self,
        xs: Array,
        ori_flow: Array,
        t: Array,
        coord: Optional[Array] = None,
        sub_idx: Optional[Array] = None,
    ) -> Array:
        """xs: (N, 2, H, W, 2) normalized flows in [0,1]; ori_flow: raw flows
        (N, 2, H, W, 2); t: (N,) timesteps (`gimm.py:129-214`).

        Returns (N, 1, H, W, 2) normalized flow at t.
        """
        n, _, h, w, _ = xs.shape
        flow01 = ori_flow[:, 0]
        flow10 = ori_flow[:, 1]
        w1, w2 = splatting_weights(flow01, flow10, self.alpha_v, self.alpha_fe)

        latent0 = self.cnn_encoder(xs[:, 0])
        latent1 = self.cnn_encoder(xs[:, 1])
        pixel_latent = splat_fuse_latents(
            self.res_conv, latent0, latent1, flow01, flow10, w1, w2, t,
            self.fwarp_type,
        )

        if coord is None:
            base = sample_coords_3d(n, (h, w), jnp.asarray([1.0]), self.coord_range)
            tt = t.reshape(-1, 1, 1, 1, 1).astype(jnp.float32)
            coord = jnp.concatenate([base[..., :1] * tt, base[..., 1:]], axis=-1)
        return self.hyponet(coord, pixel_latent, sub_idx=sub_idx)

    def forward_multi(self, xs: Array, ori_flow: Array, ts: Array) -> Array:
        """List-of-t forward (`gimm.py:150-210`): decode M timesteps shared
        across the batch in one call, hoisting the t-invariant encoder and
        splatting-weight work out of the per-t loop (the reference recomputes
        neither; it loops splat+decode per t inside one forward).

        xs/ori_flow as in __call__; ts: (M,) timesteps.
        Returns (N, M, H, W, 2) normalized flows.
        """
        n, _, h, w, _ = xs.shape
        flow01 = ori_flow[:, 0]
        flow10 = ori_flow[:, 1]
        w1, w2 = splatting_weights(flow01, flow10, self.alpha_v, self.alpha_fe)
        latent0 = self.cnn_encoder(xs[:, 0])
        latent1 = self.cnn_encoder(xs[:, 1])
        base = sample_coords_3d(n, (h, w), jnp.asarray([1.0]), self.coord_range)

        def decode_one(t_scalar: Array) -> Array:
            t_b = jnp.full((n,), t_scalar, jnp.float32)
            pixel_latent = splat_fuse_latents(
                self.res_conv, latent0, latent1, flow01, flow10, w1, w2, t_b,
                self.fwarp_type,
            )
            coord = jnp.concatenate(
                [base[..., :1] * t_scalar, base[..., 1:]], axis=-1
            )
            return self.hyponet(coord, pixel_latent)[:, 0]  # (N, H, W, 2)

        # one splat+decode live at a time (M can be large in VSF-style sweeps)
        out = jax.lax.map(decode_one, jnp.asarray(ts, jnp.float32))
        return jnp.moveaxis(out, 0, 1)


def gimm_loss(preds: Array, targets: Array) -> dict[str, Array]:
    """MSE + PSNR on normalized flows (`gimm.py:216-237`)."""
    n = preds.shape[0]
    mse = ((preds - targets) ** 2).reshape(n, -1).mean(axis=-1)
    return {
        "loss_total": mse.mean(),
        "mse": mse.mean(),
        "psnr": (-10.0 * jnp.log10(mse)).mean(),
    }
