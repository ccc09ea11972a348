"""GIMM-VFI-F: FlowFormer flow + GIMM motion INR + AMT synthesis.

Rebuilds `gimmvfi_f.py` (the reference's best-quality model family) as a
GIMMVFI_R subclass: the two models share every INR/synthesis component
(`gimmvfi_f.py:140-484` is line-for-line the same logic as
`gimmvfi_r.py:158-507`); they differ only in the flow stack
(`gimmvfi_f.py:37-44,114-138`):

  * flow estimator = FlowFormer (32 memory-decoder iterations, iters=None ->
    decoder depth, `configs/submission.py:52`),
  * NO feature/corr projections: the twins context features [128ch @1/4,
    256ch @1/8] feed AMT directly, and the bidirectional correlation pyramid
    is built over the channel-converted twins feature map itself.

All inference/training entry points (prepare / decode_one / interpolate /
train_forward and `interpolate_sequential`) are inherited.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..flow.flowformer import FlowFormer
from ..ops import corr as corr_ops
from ..ops.coords import normalize_flow
from .gimmvfi_r import GIMMVFI_R

Array = jax.Array


class GIMMVFI_F(GIMMVFI_R):
    ff_iters: int = 32

    def _setup_flow_estimator(self, f_dims):
        self.flow_estimator = FlowFormer(iters=self.ff_iters)

    def cal_bidirection_flow(self, img0: Array, img1: Array, train: bool = False):
        """FlowFormer both directions in ONE batched pass (FlowFormer has no
        batch-coupled ops, so this is exact); twins features used unprojected
        and the bidir corr pyramid built over the raw fnet
        (`gimmvfi_f.py:114-138`). img0/img1 in [0, 255], NHWC."""
        n = img0.shape[0]
        flow_2n, feats_2n, fnet_2n = self.flow_estimator(
            img0, img1, train=train, bidir=True
        )
        f01, f10 = flow_2n[:n], flow_2n[n:]
        fnet0, fnet1 = fnet_2n[:n], fnet_2n[n:]
        feats0 = [feats_2n[0][:n], feats_2n[1][:n]]
        feats1 = [feats_2n[0][n:], feats_2n[1][n:]]

        corr_pyrs = corr_ops.bidir_corr_pyramid_auto(
            fnet0, fnet1, num_levels=4,
            max_volume_bytes=self.corr_max_volume_bytes,
        )
        nflows, scalers = normalize_flow(jnp.stack([f01, -f10], axis=1))
        flows = jnp.stack([f01, f10], axis=1)
        return nflows, flows, scalers, feats0, feats1, corr_pyrs
