"""Twins-SVT encoder (truncated, 2 stages) for FlowFormer — flax, NHWC.

Rebuilds the reference's `timm.create_model("twins_svt_large")` truncated to
its first two stages (`flowformer/core/FlowFormer/encoders.py:7-48`): the
reference deletes stages 2-3 and runs patch_embed -> blocks -> PEG per stage,
returning 128ch @ 1/4 and 256ch @ 1/8 features. The vendored copy of the same
architecture lives at `.../LatentCostFormer/twins.py:1151-1289` (param-name
compatible with timm), which is what the checkpoint converter maps from.

TPU notes: attention runs as batched einsums on (B, groups, heads, tokens, d)
blocks (MXU-shaped); window partitioning is pure reshape/transpose. Shapes are
static — inputs must be padded so stage grids divide the 7x7 window/sr sizes
(the reference F.pads dynamically; we pad identically but shapes are
compile-time constants under jit).

twins_svt_large config: patch 4, dims (128, 256), heads (4, 8), depth 2 per
stage, ws 7, sr_ratios (8, 4), mlp ratio 4.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

LN_EPS = 1e-6  # Twins uses partial(LayerNorm, eps=1e-6) (`twins.py:1169`)


def _pad_hw(x: Array, mult: int) -> Array:
    """Zero-pad bottom/right so H, W divide `mult` (`twins.py:842-845`)."""
    _, h, w, _ = x.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
    return x


class Mlp(nn.Module):
    """timm Mlp: fc1 -> GELU -> fc2 (param names fc1/fc2 for conversion)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class LocallyGroupedAttn(nn.Module):
    """LSA: softmax attention within ws x ws windows (`twins.py:814-867`).

    Fused qkv linear; zero padding participates in the softmax exactly like
    the reference's F.pad path (no mask), then the pad is cropped.
    """

    num_heads: int
    ws: int = 7

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.num_heads
        xp = _pad_hw(x, self.ws)
        hp, wp = xp.shape[1:3]
        gh, gw = hp // self.ws, wp // self.ws

        qkv = nn.Dense(3 * c, name="qkv")(xp)
        # (B, gh, ws, gw, ws, 3, heads, hd) -> (3, B, g, heads, ws*ws, hd)
        qkv = qkv.reshape(b, gh, self.ws, gw, self.ws, 3, self.num_heads, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(
            3, b, gh * gw, self.num_heads, self.ws * self.ws, hd
        )
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bgnid,bgnjd->bgnij", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bgnij,bgnjd->bgnid", attn, v)

        out = out.reshape(b, gh, gw, self.num_heads, self.ws, self.ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return nn.Dense(c, name="proj")(out)


class GlobalSubSampleAttn(nn.Module):
    """GSA: queries attend to sr_ratio-subsampled keys/values
    (`twins.py:870-925`). Fused kv linear like timm."""

    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, name="q")(x).reshape(b, h * w, self.num_heads, hd)
        q = q.transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                c,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=LN_EPS, name="norm")(kv_in)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, name="kv")(kv_in).reshape(b, m, 2, self.num_heads, hd)
        kv = kv.transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bnid,bnjd->bnij", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnij,bnjd->bnid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(out)


class TwinsBlock(nn.Module):
    """Pre-norm attention + MLP block (`twins.py:1028-1097`, plain variant)."""

    num_heads: int
    ws: int  # ws > 1 -> LSA; ws == 1 -> GSA
    sr_ratio: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)
        if self.ws > 1:
            h = LocallyGroupedAttn(self.num_heads, self.ws, name="attn")(h)
        else:
            h = GlobalSubSampleAttn(self.num_heads, self.sr_ratio, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)
        h = Mlp(c * self.mlp_ratio, c, name="mlp")(h)
        return x + h


class PatchEmbed(nn.Module):
    """Conv patchify + LayerNorm (`twins.py:1122-1149`)."""

    embed_dim: int
    patch_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="proj",
        )(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class PosConv(nn.Module):
    """PEG: depthwise 3x3 conv + residual (`twins.py:1100-1116`)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(
            self.dim,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.dim,
            name="proj_0",
        )(x)
        return y + x


class TwinsSVTLarge2Stage(nn.Module):
    """twins_svt_large truncated to stages 0-1 (`encoders.py:7-48`).

    Input: NHWC image (normalized to [-1, 1] by the caller).
    Returns (x_1_8, [feat_1_4 (128ch), feat_1_8 (256ch)]).
    """

    embed_dims: Sequence[int] = (128, 256)
    num_heads: Sequence[int] = (4, 8)
    depths: Sequence[int] = (2, 2)
    sr_ratios: Sequence[int] = (8, 4)
    ws: int = 7

    @nn.compact
    def __call__(self, x: Array):
        feats = []
        for i in range(2):
            patch = 4 if i == 0 else 2
            x = PatchEmbed(self.embed_dims[i], patch, name=f"patch_embeds_{i}")(x)
            for j in range(self.depths[i]):
                # alternate LSA (even j) / GSA (odd j): `twins.py:1213`
                block_ws = self.ws if j % 2 == 0 else 1
                x = TwinsBlock(
                    self.num_heads[i],
                    block_ws,
                    self.sr_ratios[i],
                    name=f"blocks_{i}_{j}",
                )(x)
                if j == 0:
                    x = PosConv(self.embed_dims[i], name=f"pos_block_{i}")(x)
            feats.append(x)
        return x, feats
