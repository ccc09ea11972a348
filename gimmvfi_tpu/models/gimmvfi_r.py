"""GIMM-VFI-R: RAFT flow + GIMM motion INR + AMT coarse-to-fine synthesis.

Rebuilds `gimmvfi_r.py` as one flax module, TPU-first:

  * NHWC + static shapes; the per-timestep decode/synthesis loop is a python
    loop over a *static* list of timesteps (each iteration is the same traced
    computation, XLA CSEs the shared flow estimation).
  * Flow estimation runs once per pair; every timestep reuses the latents,
    features and the bidirectional correlation pyramid
    (`gimmvfi_r.py:126-156`).
  * The DS_SCALE path (`gimmvfi_r.py:328-337,294-303`) downsizes the working
    resolution and only upscales the final decoder outputs for the last
    full-resolution blend.

Inference entry: `interpolate(img_xs, t_values, ds_factor)`.
Training entry:  `train_forward(img_xs, t, sub_idx0, sub_idx1)` — decodes the
INR at t=0/t=1 on subsampled coordinates for flow-reconstruction supervision
plus the full grid at t (`trainer_gimmvfi.py:216-248`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..flow.raft import RAFT
from ..nn.layers import Conv2d
from ..ops import corr as corr_ops
from ..ops.coords import (
    coords_grid,
    normalize_flow,
    sample_coords_3d,
    unnormalize_flow,
)
from ..ops.interp import resize, warp
from .gimm_core import LatentRefiner, MotionEncoder, splat_fuse_latents, splatting_weights
from .hyponet import HypoNet
from .synthesis import (
    CombBlock,
    InitDecoder,
    MultiFlowDecoder,
    UpdateBlock,
    multi_flow_combine,
)

Array = jax.Array


class GIMMVFI_R(nn.Module):
    raft_iters: int = 20
    num_flows: int = 3
    fwarp_type: str = "linear"
    corr_radius: int = 4
    # above this, the synthesis-side bidirectional all-pairs volume is not
    # materialized; AMT lookups sample pooled target features on the fly
    # (ops/corr.py windowed path, the reference's alt_cuda_corr scenario)
    corr_max_volume_bytes: int = 2 << 30
    coord_range: tuple[float, float] = (-1.0, 1.0)
    # compute dtype for the conv-heavy paths (None = f32; jnp.bfloat16 = MXU
    # mixed precision). Flow/coordinate state and the HypoNet INR stay f32.
    dtype: Any = None
    # wrap submodules in nn.remat for the training backward (stage-2 at
    # 224^2/bs4 holds ~18 GB of full-res conv temps otherwise). Inference
    # entry points pass False to keep the forward HLO free of remat call
    # boundaries (measured end-to-end neutral at 720p on the current
    # compiler, which inlines them — the flag guards against regressions on
    # compilers that don't). Param tree is identical either way, so
    # checkpoints are interchangeable (tests/test_remat_toggle.py).
    remat: bool = True

    def setup(self):
        f_dims = (256, 128)
        skip = f_dims[1] // 2  # 64
        dt = self.dtype
        self._setup_flow_estimator(f_dims)
        rm = nn.remat if self.remat else (lambda cls, **kw: cls)
        init_cls = rm(InitDecoder, static_argnums=(7, 8))
        final_cls = rm(MultiFlowDecoder, static_argnums=(9, 10))
        self.amt_init_decoder = init_cls(
            f_dims[0], skip, dtype=dt, remat=self.remat
        )
        self.amt_final_decoder = final_cls(
            f_dims[1], skip, self.num_flows, dtype=dt, remat=self.remat
        )
        upd_cls = rm(UpdateBlock)
        self.amt_update4_low = upd_cls(
            cdim=f_dims[0] // 2, scale_factor=2.0, dtype=dt
        )
        self.amt_update4_high = upd_cls(
            cdim=f_dims[0] // 2, scale_factor=None, dtype=dt
        )
        self.amt_comb_block = CombBlock(self.num_flows, dtype=dt)

        self.cnn_encoder = rm(MotionEncoder)(dtype=dt)
        self.res_conv = rm(LatentRefiner)(dtype=dt)
        # HypoNet remat: each of the three per-step INR decodes otherwise
        # saves its full (B, H*W, 128) x 5-layer hidden chain for backward
        self.hyponet = rm(HypoNet)(
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

    def _setup_flow_estimator(self, f_dims):
        """RAFT + the 1x1 feature projections GIMMVFI_R adds on top of it
        (`gimmvfi_r.py:44-52`). GIMMVFI_F overrides this (FlowFormer emits
        AMT-shaped features natively, `gimmvfi_f.py:37-44`)."""
        self.flow_estimator = RAFT(
            iters=self.raft_iters,
            corr_max_volume_bytes=self.corr_max_volume_bytes,
            dtype=self.dtype,
        )
        self.amt_last_cproj = Conv2d(
            f_dims[0], 1, 1, 0, dtype=self.dtype, name="amt_last_cproj"
        )
        self.amt_second_last_cproj = Conv2d(
            f_dims[1], 1, 1, 0, dtype=self.dtype, name="amt_second_last_cproj"
        )
        self.amt_fproj = Conv2d(
            f_dims[0], 1, 1, 0, dtype=self.dtype, name="amt_fproj"
        )

    # ------------------------------------------------------------------ flow
    def cal_bidirection_flow(self, img0: Array, img1: Array, train: bool = False):
        """Run RAFT both directions; build AMT features + bidir corr pyramid
        (`gimmvfi_r.py:126-156`). img0/img1 in [0, 255], NHWC.

        Inference uses RAFT's batched bidirectional path (fnet/cnet once,
        reverse corr volume = free transpose — numerically identical with
        frozen BN stats, ~2x cheaper). Training keeps the reference's two
        separate calls so per-direction BatchNorm batch statistics match."""
        if not train:
            n = img0.shape[0]
            flow_2n, feats_2n, fnet_2n = self.flow_estimator(
                img0, img1, train=False, bidir=True
            )
            f01, f10 = flow_2n[:n], flow_2n[n:]
            fnet0, fnet1 = fnet_2n[:n], fnet_2n[n:]
            feats0 = [feats_2n[0][:n], feats_2n[1][:n]]
            feats1 = [feats_2n[0][n:], feats_2n[1][n:]]
        else:
            f01, feats0, fnet0 = self.flow_estimator(img0, img1, train=train)
            f10, feats1, fnet1 = self.flow_estimator(img1, img0, train=train)

        # materialized when it fits, windowed (alt_cuda_corr-equivalent,
        # `raft/corr.py:23-93` consumed at `gimmvfi_r.py:133`) at high
        # resolution where the AMT bidir volume alone is multi-GB
        corr_pyrs = corr_ops.bidir_corr_pyramid_auto(
            self.amt_fproj(fnet0),
            self.amt_fproj(fnet1),
            num_levels=4,
            max_volume_bytes=self.corr_max_volume_bytes,
        )
        features0 = [
            self.amt_second_last_cproj(feats0[0]),
            self.amt_last_cproj(feats0[1]),
        ]
        features1 = [
            self.amt_second_last_cproj(feats1[0]),
            self.amt_last_cproj(feats1[1]),
        ]
        # (N, T=2, H, W, 2); normalized pair is (f01, -f10) (`:142-145`)
        nflows, scalers = normalize_flow(
            jnp.stack([f01, -f10], axis=1)
        )
        flows = jnp.stack([f01, f10], axis=1)
        return nflows, flows, scalers, features0, features1, corr_pyrs

    # ------------------------------------------------------------------ INR
    def predict_flow(
        self,
        nflows: Array,
        flows: Array,
        t: Array,
        coord: Array,
        sub_idx: Optional[Array] = None,
    ) -> Array:
        """GIMM motion decode at timestep(s) t (`gimmvfi_r.py:158-211`).

        nflows: (N, 2, H, W, 2) normalized; flows: (N, 2, H, W, 2) raw
        (detached); t: (N,); coord: (N, 1, h, w, 3).
        Returns (N, 1, h, w, 2) normalized INR flow (or (N, K, 2) when
        sub_idx given).
        """
        flow01 = jax.lax.stop_gradient(flows[:, 0])
        flow10 = jax.lax.stop_gradient(flows[:, 1])
        w1, w2 = splatting_weights(flow01, flow10, self.alpha_v, self.alpha_fe)

        latent0 = self.cnn_encoder(nflows[:, 0])
        latent1 = self.cnn_encoder(nflows[:, 1])
        pixel_latent = splat_fuse_latents(
            self.res_conv, latent0, latent1, flow01, flow10, w1, w2, t,
            self.fwarp_type,
        )
        return self.hyponet(coord, pixel_latent, sub_idx=sub_idx)

    # ------------------------------------------------------------ synthesis
    def _corr_scale_lookup(self, corr_pyrs, coord, flow0, flow1, embt, downsample=2):
        """t-rescaled bidirectional correlation lookup (`gimmvfi_r.py:494-507`)."""
        t0_scale = 1.0 / embt
        t1_scale = 1.0 / (1.0 - embt)
        if downsample != 1:
            inv = 1.0 / downsample
            flow0 = inv * resize(flow0, inv)
            flow1 = inv * resize(flow1, inv)
        corr0, corr1 = corr_ops.bidir_corr_lookup(
            corr_pyrs,
            coord + flow1 * t1_scale,
            coord + flow0 * t0_scale,
            radius=self.corr_radius,
        )
        corr = jnp.concatenate([corr0, corr1], axis=-1)
        flow = jnp.concatenate([flow0, flow1], axis=-1)
        return corr, flow

    def _upsample_synth_features(self, features0, features1, train: bool = False):
        """Run the decoders' t-invariant UpsampleHeads once per frame pair.

        The heads only see the frozen encoder features — never the flows —
        so their full-/quarter-res outputs are identical for every timestep
        and belong in `prepare` (the reference recomputes them per call,
        `fi_components.py:255-257,307-309`; at 8x that is 7x wasted work).
        At inference both directions batch through one call; in training the
        reference's two separate calls are kept so BatchNorm batch statistics
        match per direction.
        """
        def up8(f):
            return self.amt_init_decoder(f, None, None, None, None, None, train, True)

        def up4(f):
            return self.amt_final_decoder(
                f, None, None, None, None, None, None, None, train, True
            )

        if train:
            return (
                (up8(features0[-1]), up8(features1[-1])),
                (up4(features0[0]), up4(features1[0])),
            )
        n = features0[0].shape[0]
        u8 = up8(jnp.concatenate([features0[-1], features1[-1]], axis=0))
        u4 = up4(jnp.concatenate([features0[0], features1[0]], axis=0))
        return (u8[:n], u8[n:]), (u4[:n], u4[n:])

    def warp_w_mask(self, img0, img1, ft0, ft1, mask, scale=1):
        """Masked dual warp for the aux prediction (`gimmvfi_r.py:213-220`).

        In mixed-precision mode the image payload is gathered as bf16 (the
        packed-quad fast path in ops/interp.py, ~2x); the mask blend stays
        f32. The f32 parity path is untouched.
        """
        if self.dtype is not None:
            img0 = img0.astype(self.dtype)
            img1 = img1.astype(self.dtype)
        ft0 = scale * resize(ft0, scale)
        ft1 = scale * resize(ft1, scale)
        mask = jax.nn.sigmoid(resize(mask, scale))
        return mask * warp(img0, ft0) + (1 - mask) * warp(img1, ft1)

    def frame_synthesize(
        self,
        img_xs: Array,
        flow_t: Array,
        f8_up,
        f4_up,
        corr_pyrs,
        cur_t: Array,
        full_img: Optional[Array] = None,
        train: bool = False,
    ):
        """AMT coarse-to-fine synthesis (`gimmvfi_r.py:222-322`).

        img_xs: (N, 2, H, W, 3) working-res frames in [0,1]; flow_t:
        (N, H, W, 2) INR flow at t; cur_t: (N, 1, 1, 1); f8_up/f4_up:
        per-direction feature pairs already run through the decoders'
        t-invariant UpsampleHeads (`_upsample_synth_features`).
        """
        img0 = 2.0 * img_xs[:, 0] - 1.0
        img1 = 2.0 * img_xs[:, 1] - 1.0
        n, h, w, _ = img0.shape

        lookup_coord = coords_grid(n, h // 8, w // 8)

        flow_t0_full = flow_t * (-cur_t)
        flow_t1_full = flow_t * (1.0 - cur_t)
        flow_t0_4 = 0.25 * resize(flow_t0_full, 0.25)
        flow_t1_4 = 0.25 * resize(flow_t1_full, 0.25)

        # ---- scale 1/4
        flowt0_4, flowt1_4, ft_4_ = self.amt_init_decoder(
            f8_up[0], f8_up[1], flow_t0_4, flow_t1_4, img0, img1, train, False
        )
        mask_4_, ft_4_ = ft_4_[..., :1], ft_4_[..., 1:]
        img_warp_4 = self.warp_w_mask(img0, img1, flowt0_4, flowt1_4, mask_4_, scale=4)
        img_warp_4 = jnp.clip((img_warp_4 + 1.0) / 2.0, 0.0, 1.0)

        corr_4, flow_4_lr = self._corr_scale_lookup(
            corr_pyrs, lookup_coord, flowt0_4, flowt1_4, cur_t, downsample=2
        )
        d_ft, d_flow = self.amt_update4_low(ft_4_, flow_4_lr, corr_4)
        flowt0_4 = flowt0_4 + d_flow[..., :2]
        flowt1_4 = flowt1_4 + d_flow[..., 2:4]
        ft_4_ = ft_4_ + d_ft

        corr_4 = resize(corr_4, 2.0)
        flow_4 = jnp.concatenate([flowt0_4, flowt1_4], axis=-1)
        d_ft, d_flow = self.amt_update4_high(ft_4_, flow_4, corr_4)
        flowt0_4 = flowt0_4 + d_flow[..., :2]
        flowt1_4 = flowt1_4 + d_flow[..., 2:4]
        ft_4_ = ft_4_ + d_ft

        # ---- scale 1/1
        flowt0_1, flowt1_1, mask, img_res = self.amt_final_decoder(
            ft_4_, f4_up[0], f4_up[1], flowt0_4, flowt1_4, mask_4_,
            img0, img1, train, False,
        )

        if full_img is not None:
            img0 = 2.0 * full_img[:, 0] - 1.0
            img1 = 2.0 * full_img[:, 1] - 1.0
            inv = img1.shape[1] / flowt0_1.shape[1]
            flowt0_1 = inv * resize(flowt0_1, inv)
            flowt1_1 = inv * resize(flowt1_1, inv)
            flow_t0_full = inv * resize(flow_t0_full, inv)
            flow_t1_full = inv * resize(flow_t1_full, inv)
            mask = resize(mask, inv)
            img_res = resize(img_res, inv)

        imgt_pred = multi_flow_combine(
            self.amt_comb_block, img0, img1, flowt0_1, flowt1_1, mask, img_res
        )
        imgt_pred = jnp.clip(imgt_pred, 0.0, 1.0)

        return {
            "imgt_pred": imgt_pred,
            "flowt0_pred": [flowt0_1, flowt0_4],
            "flowt1_pred": [flowt1_1, flowt1_4],
            "img_warp_4": img_warp_4,
        }

    # ----------------------------------------------------------- entry points
    def prepare(
        self,
        img_xs: Array,
        ds_factor: Optional[float] = None,
        train: bool = False,
    ) -> dict[str, Any]:
        """Everything t-independent, computed once per frame pair: flow
        estimation, AMT features, bidir corr pyramid, motion latents and
        splatting weights (`gimmvfi_r.py:126-156` + the t-invariant prefix of
        `:158-211`). The result feeds any number of `decode_one` calls."""
        full_img = None
        if ds_factor is not None and ds_factor != 1:
            full_img = img_xs
            small0 = resize(img_xs[:, 0], ds_factor)
            small1 = resize(img_xs[:, 1], ds_factor)
            img_xs = jnp.stack([small0, small1], axis=1)

        nflows, flows, scalers, features0, features1, corr_pyrs = (
            self.cal_bidirection_flow(
                255.0 * img_xs[:, 0], 255.0 * img_xs[:, 1], train=train
            )
        )
        flow01 = jax.lax.stop_gradient(flows[:, 0])
        flow10 = jax.lax.stop_gradient(flows[:, 1])
        w1, w2 = splatting_weights(flow01, flow10, self.alpha_v, self.alpha_fe)
        latent0 = self.cnn_encoder(nflows[:, 0])
        latent1 = self.cnn_encoder(nflows[:, 1])
        f8_up, f4_up = self._upsample_synth_features(features0, features1, train)
        return {
            "img_xs": img_xs,
            "full_img": full_img,
            "nflows": nflows,
            "flows": flows,
            "scalers": scalers,
            "f8_up": f8_up,
            "f4_up": f4_up,
            "corr_pyrs": corr_pyrs,
            "flow01": flow01,
            "flow10": flow10,
            "w1": w1,
            "w2": w2,
            "latent0": latent0,
            "latent1": latent1,
        }

    def decode_one(self, prep: dict, tv: Array, train: bool = False) -> dict[str, Any]:
        """One timestep: splat latents to t, HypoNet flow decode, AMT
        synthesis (`gimmvfi_r.py:158-211,376-396`). tv: scalar timestep
        (python float or traced 0-d array — safe inside `lax.scan`)."""
        img_xs = prep["img_xs"]
        n, _, h, w, _ = img_xs.shape
        tv = jnp.asarray(tv, jnp.float32)
        t = jnp.broadcast_to(tv.reshape(-1), (n,))
        coord = sample_coords_3d(n, (h, w), tv, self.coord_range)

        pixel_latent = splat_fuse_latents(
            self.res_conv,
            prep["latent0"],
            prep["latent1"],
            prep["flow01"],
            prep["flow10"],
            prep["w1"],
            prep["w2"],
            t,
            self.fwarp_type,
        )
        ninr = self.hyponet(coord, pixel_latent)
        flow_t = unnormalize_flow(ninr, prep["scalers"])[:, 0]
        out = self.frame_synthesize(
            img_xs,
            flow_t,
            prep["f8_up"],
            prep["f4_up"],
            prep["corr_pyrs"],
            t.reshape(n, 1, 1, 1),
            full_img=prep["full_img"],
            train=train,
        )
        out["flowt"] = flow_t
        out["ninrflow"] = ninr
        return out

    def interpolate(
        self,
        img_xs: Array,
        t_values: Sequence[float],
        ds_factor: Optional[float] = None,
        train: bool = False,
    ) -> dict[str, Any]:
        """Interpolate at shared timesteps (`gimmvfi_r.py:324-407`, eval path).

        img_xs: (N, 2, H, W, 3) in [0, 1]; t_values: static python floats.
        Returns dict with per-timestep lists. For long timestep lists prefer
        `interpolate_sequential` (bounded live memory via `lax.scan`).
        """
        prep = self.prepare(img_xs, ds_factor, train=train)
        imgt_preds, flowts, inr_flows = [], [], []
        for tv in t_values:
            out = self.decode_one(prep, tv, train=train)
            imgt_preds.append(out["imgt_pred"])
            flowts.append(out["flowt"])
            inr_flows.append(out["ninrflow"])

        return {
            "imgt_pred": imgt_preds,
            "flowt": flowts,
            "ninrflow": inr_flows,
            "nflow": prep["nflows"],
            "raft_flow": prep["flows"],
        }

    def train_forward(
        self,
        img_xs: Array,
        t: Array,
        sub_idx0: Array,
        sub_idx1: Array,
        train: bool = True,
    ) -> dict[str, Any]:
        """Stage-2 training forward (`trainer_gimmvfi.py:216-258`).

        t: (N,) per-sample timesteps; sub_idx0/1: (N, K) flattened coordinate
        indices for the t=0 / t=1 flow-reconstruction supervision.
        """
        n, _, h, w, _ = img_xs.shape
        nflows, flows, scalers, features0, features1, corr_pyrs = (
            self.cal_bidirection_flow(
                255.0 * img_xs[:, 0], 255.0 * img_xs[:, 1], train=train
            )
        )

        ones = jnp.ones((n,), jnp.float32)
        coord0 = sample_coords_3d(n, (h, w), jnp.asarray([0.0]), self.coord_range)
        coord1 = sample_coords_3d(n, (h, w), jnp.asarray([1.0]), self.coord_range)
        coord_t = self._coords_per_sample(t, (h, w))

        inr0 = self.predict_flow(nflows, flows, 0.0 * ones, coord0, sub_idx=sub_idx0)
        inr1 = self.predict_flow(nflows, flows, ones, coord1, sub_idx=sub_idx1)
        inr_t = self.predict_flow(nflows, flows, t, coord_t)

        flow_t = unnormalize_flow(inr_t, scalers.reshape(n, 1, 1, 1, 1))[:, 0]
        f8_up, f4_up = self._upsample_synth_features(features0, features1, train)
        out = self.frame_synthesize(
            img_xs,
            flow_t,
            f8_up,
            f4_up,
            corr_pyrs,
            t.reshape(n, 1, 1, 1),
            train=train,
        )
        out.update(
            {
                "ninrflow": [inr0, inr1],
                "nflow": nflows,
                "flowt": flow_t,
                "raft_flow": flows,
            }
        )
        return out

    def _coords_per_sample(self, t: Array, hw: tuple[int, int]) -> Array:
        base = sample_coords_3d(t.shape[0], hw, jnp.asarray([1.0]), self.coord_range)
        tt = t.reshape(-1, 1, 1, 1, 1).astype(jnp.float32)
        return jnp.concatenate([base[..., :1] * tt, base[..., 1:]], axis=-1)

    def __call__(self, img_xs: Array, t_values: Sequence[float] = (0.5,)):
        """Default apply: midpoint interpolation (init-friendly)."""
        return self.interpolate(img_xs, t_values)


def interpolate_sequential(
    model,
    variables,
    img_xs: Array,
    t_values: Array,
    ds_factor: Optional[float] = None,
) -> dict[str, Array]:
    """Nx interpolation with bounded live memory.

    Flow estimation runs once; the per-timestep INR decode + AMT synthesis run
    under `lax.scan` so only ONE timestep's full-resolution activations are
    live at a time (vs the reference's python loop over t,
    `gimmvfi_r.py:376-396`, which on TPU would keep every unrolled timestep's
    temps alive). Works for any model exposing `prepare` / `decode_one`
    (GIMM-VFI-R and -F).

    t_values: (T,) array of timesteps. Returns stacked
    {imgt_pred: (T, N, H, W, 3), flowt: (T, N, h, w, 2)}.
    """
    prep = model.apply(variables, img_xs, ds_factor, method=model.prepare)

    def body(carry, tv):
        out = model.apply(variables, prep, tv, method=model.decode_one)
        return carry, (out["imgt_pred"], out["flowt"])

    _, (imgs, flows) = jax.lax.scan(
        body, None, jnp.asarray(t_values, jnp.float32)
    )
    return {"imgt_pred": imgs, "flowt": flows}
