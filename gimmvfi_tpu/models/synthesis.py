"""AMT-style coarse-to-fine frame synthesis components (flax, NHWC).

Rebuilds `modules/fi_components.py`: the init decoder (1/8 -> 1/4), the
update blocks with bidirectional correlation input, the multi-flow final
decoder (1/4 -> 1/1), and the multi-flow blend. BatchNorm layers keep torch
semantics via flax nn.BatchNorm (running stats; `train` toggles batch-stat
mode for stage-2 fine-tuning).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv2d, PReLU, leaky_relu, pixel_shuffle
from ..ops.interp import resize, warp
from ..ops.strips import from_strips, strip_worthwhile, to_strips

Array = jax.Array

# Rematerialized building blocks for the full-resolution decoder stacks:
# the stage-2 training recipe (224^2, batch 4) keeps ~18 GB of conv temps
# alive through the backward otherwise (OOM on a 16 GB v5e). Block-level
# checkpoints bound live activations to one block's temps; inference is
# unaffected (no cotangents -> XLA elides the checkpoint).


class LateralBlock(nn.Module):
    """conv-lrelu-conv residual block (`fi_components.py:17-29`)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv_0")(x)
        y = leaky_relu(y, 0.1)
        y = Conv2d(self.dim, 3, 1, 1, dtype=self.dtype, name="conv_2")(y)
        return x + y


class ConvPReLU(nn.Module):
    """convrelu = Conv2d + PReLU (`fi_components.py:32-54`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2d(self.features, self.kernel_size, self.stride, self.padding,
                   dtype=self.dtype, name="conv")(x)
        return PReLU(self.features, name="prelu")(x)


class ResBlock(nn.Module):
    """Residual block with a narrow side channel (`fi_components.py:97-154`)."""

    in_channels: int
    side_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = self.side_channels
        dt = self.dtype
        out = ConvPReLU(self.in_channels, dtype=dt, name="conv1")(x)

        side = ConvPReLU(s, dtype=dt, name="conv2")(out[..., -s:])
        out = ConvPReLU(self.in_channels, dtype=dt, name="conv3")(
            jnp.concatenate([out[..., :-s], side], -1)
        )

        side = ConvPReLU(s, dtype=dt, name="conv4")(out[..., -s:])
        out = Conv2d(self.in_channels, 3, 1, 1, dtype=dt, name="conv5")(
            jnp.concatenate([out[..., :-s], side], -1)
        )
        return PReLU(self.in_channels, name="prelu")(x + out)


class UpsampleHead(nn.Module):
    """PixelShuffle(+PixelShuffle) + convrelu stack + 1x1 conv + BN + ReLU
    (`fi_components.py:234-244` / `:284-295`)."""

    in_ch: int
    num_shuffles: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dt = self.dtype
        for _ in range(self.num_shuffles):
            x = pixel_shuffle(x, 2)
        c4 = self.in_ch // 4
        x = ConvPReLU(c4, 5, 1, 2, dtype=dt, name="cr0")(x)
        x = ConvPReLU(c4, dtype=dt, name="cr1")(x)
        x = ConvPReLU(c4, dtype=dt, name="cr2")(x)
        x = ConvPReLU(c4, dtype=dt, name="cr3")(x)
        x = ConvPReLU(self.in_ch // 2, dtype=dt, name="cr4")(x)
        x = Conv2d(self.in_ch // 2, 1, 1, 0, dtype=dt, name="proj")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn"
        )(x)
        return nn.relu(x)


_ResBlockR = nn.remat(ResBlock)
_UpsampleHeadR = nn.remat(UpsampleHead, static_argnums=(2,))


def _block_classes(remat: bool):
    """ResBlock/UpsampleHead classes with or without the nn.remat wrapper.

    remat=True for training (bounds full-res conv temps in the backward);
    False for inference keeps the forward HLO free of remat call boundaries
    (end-to-end neutral on the current compiler, which inlines them; the
    flag guards compilers that don't). Param tree identical either way."""
    if remat:
        return _ResBlockR, _UpsampleHeadR
    return ResBlock, UpsampleHead

# 3x3-conv depth of the decoder main stacks, from the block structure (each
# conv eats one halo column per side): ResBlock = conv1..conv5, the decoder
# body = cb0 + 3 ResBlocks + cb4. The strip halo MUST equal this depth for
# strip exactness — verified by the strips-vs-unsplit model-level test
# (tests/test_strips.py::test_multiflow_decoder_strips_equivalence).
_RESBLOCK_CONV_DEPTH = 5
_DECODER_STACK_DEPTH = 1 + 3 * _RESBLOCK_CONV_DEPTH + 1  # 17


class InitDecoder(nn.Module):
    """NewInitDecoder (`fi_components.py:229-276`): upsample 1/8 features to
    1/4, warp by the INR flows, refine through ResBlocks; emits corrected
    flows + 1ch mask + feature."""

    in_ch: int  # 256
    skip_ch: int  # 64
    dtype: Any = None
    remat: bool = True

    @nn.compact
    def __call__(
        self,
        f0,
        f1,
        flow0_in=None,
        flow1_in=None,
        img0=None,
        img1=None,
        train: bool = False,
        upsample_only: bool = False,
    ):
        res_cls, up_cls = _block_classes(self.remat)
        up = up_cls(self.in_ch, 1, dtype=self.dtype, name="upsample")
        if upsample_only:
            # t-invariant feature upsampling, hoisted into `prepare` so the
            # per-timestep decode doesn't recompute it (same math: the head
            # only sees the frozen features, never the flows)
            return up(f0, train)
        # f0/f1 arrive pre-upsampled (from the upsample_only stage)

        scale = f0.shape[1] / img0.shape[1]
        img0 = resize(img0, scale)
        img1 = resize(img1, scale)
        # one gather per flow: features and image share the same warp
        c_f = f0.shape[-1]
        w0_all = warp(jnp.concatenate([f0, img0.astype(f0.dtype)], -1), flow0_in)
        w1_all = warp(jnp.concatenate([f1, img1.astype(f1.dtype)], -1), flow1_in)
        f0w, w0 = w0_all[..., :c_f], w0_all[..., c_f:]
        f1w, w1 = w1_all[..., :c_f], w1_all[..., c_f:]
        f_in = jnp.concatenate(
            [f0w, f1w, flow0_in, flow1_in, img0, img1, w0, w1], -1
        )

        c = self.in_ch // 2
        dt = self.dtype
        h = ConvPReLU(c, 1, 1, 0, dtype=dt, name="cb0")(f_in)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb1")(h)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb2")(h)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb3")(h)
        out = Conv2d(c + 5, 3, 1, 1, dtype=dt, name="cb4")(h)

        ft_ = out[..., 4:]
        # flow corrections accumulate in float32 regardless of compute dtype
        flow0 = flow0_in + out[..., :2].astype(flow0_in.dtype)
        flow1 = flow1_in + out[..., 2:4].astype(flow1_in.dtype)
        return flow0, flow1, ft_


class UpdateBlock(nn.Module):
    """AMT BasicUpdateBlock (`fi_components.py:157-222`): bidirectional corr +
    flow-pair encoders -> conv-'gru' -> delta feature & delta flow; optional
    2x down/up internal scale."""

    cdim: int  # 128
    hidden_dim: int = 192
    flow_dim: int = 64
    corr_dim: int = 256
    corr_dim2: int = 192
    fc_dim: int = 188
    scale_factor: Optional[float] = None
    out_num: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, net: Array, flow: Array, corr: Array):
        sf = self.scale_factor
        dt = self.dtype
        if sf is not None:
            net = resize(net, 1.0 / sf)
        cor = leaky_relu(Conv2d(self.corr_dim, 1, 1, 0, dtype=dt, name="convc1")(corr), 0.1)
        cor = leaky_relu(Conv2d(self.corr_dim2, 3, 1, 1, dtype=dt, name="convc2")(cor), 0.1)
        flo = leaky_relu(Conv2d(self.flow_dim * 2, 7, 1, 3, dtype=dt, name="convf1")(flow), 0.1)
        flo = leaky_relu(Conv2d(self.flow_dim, 3, 1, 1, dtype=dt, name="convf2")(flo), 0.1)
        inp = leaky_relu(
            Conv2d(self.fc_dim, 3, 1, 1, dtype=dt, name="conv")(
                jnp.concatenate([cor, flo], -1)
            ),
            0.1,
        )
        if dt is not None:
            flow = flow.astype(dt)
            net = net.astype(dt)
        inp = jnp.concatenate([inp, flow, net], -1)

        h = Conv2d(self.hidden_dim, 3, 1, 1, dtype=dt, name="gru_0")(inp)
        h = leaky_relu(h, 0.1)
        h = Conv2d(self.hidden_dim, 3, 1, 1, dtype=dt, name="gru_2")(h)

        dnet = Conv2d(self.hidden_dim, 3, 1, 1, dtype=dt, name="feat_head_0")(h)
        dnet = leaky_relu(dnet, 0.1)
        dnet = Conv2d(self.cdim, 3, 1, 1, dtype=dt, name="feat_head_2")(dnet)

        dflow = Conv2d(self.hidden_dim, 3, 1, 1, dtype=dt, name="flow_head_0")(h)
        dflow = leaky_relu(dflow, 0.1)
        dflow = Conv2d(4 * self.out_num, 3, 1, 1, dtype=dt, name="flow_head_2")(dflow)
        # delta-flows leave the block in float32 so flow state stays f32
        dflow = dflow.astype(jnp.float32)

        if sf is not None:
            dnet = resize(dnet, sf)
            dflow = sf * resize(dflow, sf)
        return dnet, dflow


class MultiFlowDecoder(nn.Module):
    """NewMultiFlowDecoder (`fi_components.py:279-340`): 1/4 -> 1/1 via double
    PixelShuffle; predicts num_flows flow pairs + masks + image residuals."""

    in_ch: int  # 128
    skip_ch: int  # 64
    num_flows: int = 3
    dtype: Any = None
    remat: bool = True

    @nn.compact
    def __call__(
        self,
        ft_,
        f0=None,
        f1=None,
        flow0=None,
        flow1=None,
        mask=None,
        img0=None,
        img1=None,
        train: bool = False,
        upsample_only: bool = False,
    ):
        res_cls, up_cls = _block_classes(self.remat)
        up = up_cls(self.in_ch, 2, dtype=self.dtype, name="upsample")
        if upsample_only:
            # t-invariant feature upsampling, hoisted into `prepare` (the
            # feature slot is `ft_` in this stage; see InitDecoder)
            return up(ft_, train)
        # f0/f1 arrive pre-upsampled (from the upsample_only stage)
        n = self.num_flows

        flow0 = 4.0 * resize(flow0, 4.0)
        flow1 = 4.0 * resize(flow1, 4.0)
        ft_ = resize(ft_, 4.0)
        mask = resize(mask, 4.0)
        # one gather per flow: features and image share the same warp
        c_f = f0.shape[-1]
        w0_all = warp(jnp.concatenate([f0, img0.astype(f0.dtype)], -1), flow0)
        w1_all = warp(jnp.concatenate([f1, img1.astype(f1.dtype)], -1), flow1)
        f0w, w0 = w0_all[..., :c_f], w0_all[..., c_f:]
        f1w, w1 = w1_all[..., :c_f], w1_all[..., c_f:]
        f_in = jnp.concatenate(
            [ft_, f0w, f1w, flow0, flow1, mask, img0, img1, w0, w1], -1
        )

        c = self.in_ch * 2
        dt = self.dtype
        # vertical-strip space-to-batch (ops/strips.py): XLA's conv runs
        # ~2x faster at batch >= 8; one halo column per conv covers the
        # whole 3x3 stack (cb0 + 3x5 ResBlock convs + cb4) EXACTLY
        halo = _DECODER_STACK_DEPTH
        w_full = f_in.shape[2]
        use_strips = w_full % 8 == 0 and strip_worthwhile(w_full, 8, halo)
        if use_strips:
            f_in = to_strips(f_in, halo)
        h = ConvPReLU(c, dtype=dt, name="cb0")(f_in)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb1")(h)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb2")(h)
        h = res_cls(c, self.skip_ch, dtype=dt, name="cb3")(h)
        out = Conv2d(8 * n, 3, 1, 1, dtype=dt, name="cb4")(h).astype(jnp.float32)
        if use_strips:
            out = from_strips(out, halo)

        d_flow0, d_flow1, d_mask, img_res = jnp.split(
            out, [2 * n, 4 * n, 5 * n], axis=-1
        )
        mask = jax.nn.sigmoid(d_mask + jnp.tile(mask, (1, 1, 1, n)))
        flow0 = d_flow0 + jnp.tile(flow0, (1, 1, 1, n))
        flow1 = d_flow1 + jnp.tile(flow1, (1, 1, 1, n))
        return flow0, flow1, mask, img_res


class CombBlock(nn.Module):
    """7x7 conv + PReLU + 7x7 conv correction head (`gimmvfi_r.py:60-64`)."""

    num_flows: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = self.num_flows
        x = Conv2d(6 * n, 7, 1, 3, dtype=self.dtype, name="conv_0")(x)
        x = PReLU(6 * n, name="prelu")(x)
        return Conv2d(3, 7, 1, 3, dtype=self.dtype, name="conv_2")(x).astype(jnp.float32)


def multi_flow_combine(
    comb_block,
    img0: Array,
    img1: Array,
    flow0: Array,
    flow1: Array,
    mask: Array,
    img_res: Array,
) -> Array:
    """Blend num_flows backward warps of both frames (`fi_components.py:57-94`).

    img0/img1: (N, H, W, 3) in [-1, 1]; flow0/flow1: (N, H, W, 2*K);
    mask: (N, H, W, K); img_res: (N, H, W, 3*K). Output in [0, 1].

    In mixed-precision mode (comb_block.dtype set) the 2K full-res image
    warps gather bf16 payload — the packed-quad fast path in ops/interp.py
    (~2.6x on the dominant gather cost); mask/residual blending stays f32.
    """
    n, h, w, ck = flow0.shape
    k = ck // 2
    if comb_block.dtype is not None:
        img0 = img0.astype(comb_block.dtype)
        img1 = img1.astype(comb_block.dtype)

    def regroup(x, c):
        # (N, H, W, K*c) -> (N*K, H, W, c) keeping torch's (b, k) flattening
        return (
            x.reshape(n, h, w, k, c).transpose(0, 3, 1, 2, 4).reshape(n * k, h, w, c)
        )

    f0 = regroup(flow0, 2)
    f1 = regroup(flow1, 2)
    m = regroup(mask, 1)
    res = regroup(img_res, 3)
    i0 = jnp.repeat(img0, k, axis=0)
    i1 = jnp.repeat(img1, k, axis=0)

    w0 = warp(i0, f0)
    w1 = warp(i1, f1)
    img_warps = m * w0 + (1 - m) * w1 + res  # (N*K, H, W, 3)
    img_warps = img_warps.reshape(n, k, h, w, 3)

    stacked = img_warps.transpose(0, 2, 3, 1, 4).reshape(n, h, w, k * 3)
    res_corr = comb_block(stacked)
    pred = img_warps.mean(axis=1) + res_corr
    return (pred + 1.0) / 2.0
