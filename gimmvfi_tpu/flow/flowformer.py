"""FlowFormer (LatentCostFormer) optical-flow estimator — flax, NHWC.

Rebuilds the reference FlowFormer stack TPU-first
(`flowformer/core/FlowFormer/LatentCostFormer/`):

  * `transformer.py:28-74` — top module: twins context encoder, memory
    encoder (latent cost tokens), recurrent memory decoder.
  * `encoder.py:30-96,349-539` — cost PatchEmbed + CostPerceiverEncoder:
    the all-pairs cost volume is patchified per source pixel, 8 latent
    tokens cross-attend to it, then `encoder_depth=3` alternating latent
    self-attention and "vertical" (across source pixels) Twins attention.
  * `decoder.py:25-321` — MemoryDecoder: 32 ConvGRU iterations; each gathers
    a 9x9 local cost window, cross-attends the flow token to the cost
    memory, aggregates motion globally (GMA), and updates flow; convex 8x
    upsample from the final mask.
  * `gma.py:32-115`, `gru.py:76-160`, `attention.py:39-182` — GMA,
    update block, attention prims, linear sine positional embedding.

TPU design decisions:
  * The decoder loop is `nn.scan` — one compiled body for 32 iterations.
  * The cross-attention k/v over the cost memory are loop-INVARIANT; the
    reference caches them after iteration 0 (`decoder.py:87-89`) — here the
    k/v projections live in the parent and run exactly once, before the scan.
  * All attention is batched einsum on static shapes (MXU); window
    partitioning is reshape/transpose; channels-last throughout.

Config defaults follow `flowformer/configs/submission.py:19-62`
(latentcostformer: 8 latent tokens of dim 128, query dim 64, encoder depth
3, decoder depth 32, GMA on, linear PE, vert_c_dim 64). All LayerNorms here
use torch's default eps=1e-5 (the Twins-class 1e-6 norms live in twins.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv2d
from ..ops import corr as corr_ops
from ..ops.coords import coords_grid
from .raft import SepConvGRU, convex_upsample_8x
from .twins import TwinsSVTLarge2Stage

Array = jax.Array
EPS5 = 1e-5


# ------------------------------------------------------------------ helpers
def linear_pe(coords: Array, dim: int) -> Array:
    """LinearPositionEmbeddingSine (`attention.py:170-182`).

    coords: (..., 2) as (x, y). Returns (..., dim):
    [sin(3.14*x*f/200) | cos(3.14*x*f/200) | sin(y...) | cos(y...)],
    f = 0..dim//4-1. The reference's literal 3.14 (not pi) is kept.
    """
    freqs = jnp.arange(dim // 4, dtype=jnp.float32) * (1.0 / 200.0)
    x = coords[..., -2:-1] * freqs
    y = coords[..., -1:] * freqs
    return jnp.concatenate(
        [jnp.sin(3.14 * x), jnp.cos(3.14 * x), jnp.sin(3.14 * y), jnp.cos(3.14 * y)],
        axis=-1,
    )


def _mha(q: Array, k: Array, v: Array, heads: int) -> Array:
    """MultiHeadAttention (`attention.py:39-66`): plain softmax attention.

    q: (B, I, D); k/v: (B, J, D). scale = (D/heads)^-0.5 on the qk dim.
    """
    b, i, d = q.shape
    hd = d // heads
    scale = (d / heads) ** -0.5
    qh = q.reshape(b, i, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, heads, v.shape[-1] // heads).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", qh, kh) * scale, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, i, -1)


class FFN(nn.Module):
    """Sequential(Linear, GELU, Drop, Linear, Drop) — torch indices 0 and 3."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.dim, name="fc0")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="fc3")(h)


# -------------------------------------------------------- cost patch embed
class CostPatchEmbed(nn.Module):
    """Patchify one cost map + coordinate PE (`encoder.py:30-96`).

    Input: (B', H2, W2, 1) cost maps (B' = B*H1*W1). patch_size=8: three
    stride-2 k6 convs. Output tokens (B', H3*W3, 2*embed_dim) and (H3, W3).
    """

    embed_dim: int = 64
    patch_size: int = 8

    @nn.compact
    def __call__(self, x: Array):
        b = x.shape[0]
        ph = (self.patch_size - x.shape[1] % self.patch_size) % self.patch_size
        pw = (self.patch_size - x.shape[2] % self.patch_size) % self.patch_size
        if ph or pw:
            x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])

        d = self.embed_dim
        pad22 = [(2, 2), (2, 2)]
        x = nn.Conv(d // 4, (6, 6), strides=(2, 2), padding=pad22, name="proj_0")(x)
        x = nn.relu(x)
        x = nn.Conv(d // 2, (6, 6), strides=(2, 2), padding=pad22, name="proj_2")(x)
        x = nn.relu(x)
        x = nn.Conv(d, (6, 6), strides=(2, 2), padding=pad22, name="proj_4")(x)
        h3, w3 = x.shape[1], x.shape[2]

        # patch centers in cost-map pixel coords (`encoder.py:79-90`)
        pc = coords_grid(1, h3, w3) * self.patch_size + self.patch_size / 2.0
        pe = jnp.broadcast_to(linear_pe(pc, d), (b, h3, w3, d))

        x = jnp.concatenate([x, pe], axis=-1)
        x = nn.Conv(2 * d, (1, 1), name="ffn_0")(x)
        x = nn.relu(x)
        x = nn.Conv(2 * d, (1, 1), name="ffn_2")(x)
        x = nn.LayerNorm(epsilon=EPS5, name="norm")(x.reshape(b, h3 * w3, 2 * d))
        return x, (h3, w3)


# ------------------------------------------------- perceiver input / latent
class PerceiverInputLayer(nn.Module):
    """Encoder CrossAttentionLayer (`encoder.py:282-346`): the 8 latent
    tokens cross-attend to the patchified cost map."""

    query_dim: int = 128
    heads: int = 8

    @nn.compact
    def __call__(self, query: Array, tgt: Array) -> Array:
        """query: (B', K, Dq) latent tokens; tgt: (B', M, Dt)."""
        short_cut = query
        q_in = nn.LayerNorm(epsilon=EPS5, name="norm1")(query)
        q = nn.Dense(self.query_dim, name="q")(q_in)
        k = nn.Dense(self.query_dim, name="k")(tgt)
        v = nn.Dense(self.query_dim, name="v")(tgt)
        x = _mha(q, k, v, self.heads)
        x = short_cut + nn.Dense(self.query_dim, name="proj")(x)
        return x + FFN(self.query_dim, name="ffn")(
            nn.LayerNorm(epsilon=EPS5, name="norm2")(x)
        )


class LatentSelfAttentionLayer(nn.Module):
    """SelfAttentionLayer over the K latent tokens (`encoder.py:214-272`)."""

    dim: int = 128
    heads: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        short_cut = x
        h = nn.LayerNorm(epsilon=EPS5, name="norm1")(x)
        q = nn.Dense(self.dim, name="q")(h)
        k = nn.Dense(self.dim, name="k")(h)
        v = nn.Dense(self.dim, name="v")(h)
        h = _mha(q, k, v, self.heads)
        x = short_cut + nn.Dense(self.dim, name="proj")(h)
        return x + FFN(self.dim, name="ffn")(
            nn.LayerNorm(epsilon=EPS5, name="norm2")(x)
        )


# -------------------------------------------- vertical (Twins RPE+context)
class LocallyGroupedAttnRPEContext(nn.Module):
    """LSA with linear-PE RPE and context-augmented q/k (`twins.py:331-427`).

    x: (B', H, W, C); context: (B', H, W, 256) raw twins context (projected
    to vert_c_dim here, matching the torch module's own context_proj).
    """

    num_heads: int = 8
    ws: int = 7
    vert_c_dim: int = 64

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.num_heads
        ctx = nn.Dense(self.vert_c_dim, name="context_proj")(context)
        x_qk = jnp.concatenate([x, ctx], axis=-1)
        c_qk = c + self.vert_c_dim

        ph = (self.ws - h % self.ws) % self.ws
        pw = (self.ws - w % self.ws) % self.ws
        if ph or pw:
            x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
            x_qk = jnp.pad(x_qk, [(0, 0), (0, ph), (0, pw), (0, 0)])
        hp, wp = h + ph, w + pw
        gh, gw = hp // self.ws, wp // self.ws

        def windows(t, ch):
            t = t.reshape(b, gh, self.ws, gw, self.ws, ch)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, gh * gw, self.ws * self.ws, ch
            )

        v = nn.Dense(c, name="v")(windows(x, c))

        # per-window PE on local ws x ws coords (`twins.py:394-401`)
        pe = linear_pe(coords_grid(1, self.ws, self.ws), c_qk)
        xq = windows(x_qk, c_qk) + pe.reshape(1, 1, self.ws * self.ws, c_qk)
        q = nn.Dense(c, name="q")(xq)
        k = nn.Dense(c, name="k")(xq)

        def heads(t):
            return t.reshape(b, gh * gw, -1, self.num_heads, hd).transpose(
                0, 1, 3, 2, 4
            )

        attn = jnp.einsum("bgnid,bgnjd->bgnij", heads(q), heads(k)) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bgnij,bgnjd->bgnid", attn, heads(v))
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, gh, gw, self.ws, self.ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return nn.Dense(c, name="proj")(out)


class GlobalSubSampleAttnRPEContext(nn.Module):
    """GSA with linear-PE RPE and context-augmented q/k (`twins.py:430-546`).
    One shared LayerNorm over the subsampled key and value paths."""

    num_heads: int = 8
    sr_ratio: int = 4
    vert_c_dim: int = 64

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.num_heads
        ctx = nn.Dense(self.vert_c_dim, name="context_proj")(context)
        x_qk = jnp.concatenate([x, ctx], axis=-1)
        c_qk = c + self.vert_c_dim

        sr = self.sr_ratio
        ph = (sr - h % sr) % sr
        pw = (sr - w % sr) % sr
        if ph or pw:
            x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
            x_qk = jnp.pad(x_qk, [(0, 0), (0, ph), (0, pw), (0, 0)])
        hp, wp = h + ph, w + pw

        pe_q = linear_pe(coords_grid(1, hp, wp), c_qk)
        q = nn.Dense(c, name="q")(x_qk + pe_q)
        q = q.reshape(b, hp * wp, self.num_heads, hd).transpose(0, 2, 1, 3)

        x_ss = nn.Conv(c, (sr, sr), strides=(sr, sr), padding="VALID",
                       name="sr_value")(x)
        xqk_ss = nn.Conv(c, (sr, sr), strides=(sr, sr), padding="VALID",
                         name="sr_key")(x_qk)
        norm = nn.LayerNorm(epsilon=EPS5, name="norm")
        x_ss = norm(x_ss)
        xqk_ss = norm(xqk_ss)

        hs, ws_ = hp // sr, wp // sr
        pe_kv = linear_pe(coords_grid(1, hs, ws_) * sr, c)
        k = nn.Dense(c, name="k")(xqk_ss + pe_kv)
        k = k.reshape(b, hs * ws_, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(c, name="v")(x_ss)
        v = v.reshape(b, hs * ws_, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            jnp.einsum("bnid,bnjd->bnij", q, k) * (hd**-0.5), axis=-1
        )
        out = jnp.einsum("bnij,bnjd->bnid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return nn.Dense(c, name="proj")(out)


class VerticalBlock(nn.Module):
    """Twins Block with RPE+context attention (`twins.py:1028-1097`;
    constructed with torch's default LayerNorm eps 1e-5,
    `encoder.py:175-198`)."""

    num_heads: int = 8
    ws: int = 7  # ws > 1 -> local; ws == 1 -> global subsample
    sr_ratio: int = 4
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=EPS5, name="norm1")(x)
        if self.ws > 1:
            h = LocallyGroupedAttnRPEContext(self.num_heads, self.ws, name="attn")(
                h, context
            )
        else:
            h = GlobalSubSampleAttnRPEContext(
                self.num_heads, self.sr_ratio, name="attn"
            )(h, context)
        x = x + h
        h = nn.LayerNorm(epsilon=EPS5, name="norm2")(x)
        h = nn.Dense(c * self.mlp_ratio, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="mlp_fc2")(h)
        return x + h


class VerticalSelfAttentionLayer(nn.Module):
    """local Twins block + global Twins block (`encoder.py:149-204`)."""

    dim: int = 128

    @nn.compact
    def __call__(self, x: Array, size, context: Array) -> Array:
        """x: (B*K, H1*W1, D); context: (B*K, H1, W1, 256)."""
        h1, w1 = size
        b = x.shape[0]
        xs = x.reshape(b, h1, w1, self.dim)
        xs = VerticalBlock(8, 7, 4, name="local_block")(xs, context)
        xs = VerticalBlock(8, 1, 4, name="global_block")(xs, context)
        return xs.reshape(b, h1 * w1, self.dim)


# ----------------------------------------------------- cost perceiver
class CostPerceiverEncoder(nn.Module):
    """`encoder.py:349-466`: patchify cost maps, cross-attend 8 latent
    tokens, alternate latent/vertical attention, residual shortcut."""

    depth: int = 3
    latent_tokens: int = 8
    latent_dim: int = 128
    input_dim: int = 64

    @nn.compact
    def __call__(self, cost_volume: Array, context: Array):
        """cost_volume: (B, H1, W1, H2, W2) single-head cost; context:
        (B, H1, W1, 256) twins context features. Returns cost memory
        (B*H1*W1, K, latent_dim) and cost_maps (B*H1*W1, H2, W2, 1)."""
        b, h1, w1, h2, w2 = cost_volume.shape
        k_tok = self.latent_tokens

        cost_maps = cost_volume.reshape(b * h1 * w1, h2, w2, 1)
        tokens, _ = CostPatchEmbed(self.input_dim, name="patch_embed")(cost_maps)

        latents = self.param(
            "latent_tokens",
            nn.initializers.normal(1.0),
            (1, k_tok, self.latent_dim),
        )
        q = jnp.broadcast_to(latents, (b * h1 * w1, k_tok, self.latent_dim))
        x = PerceiverInputLayer(self.latent_dim, name="input_layer")(q, tokens)
        short_cut = x

        # Context replicated per latent token, batch-major: vertical-token
        # row j gets context[j // K]. (The torch `context.repeat(K,...)`
        # tiling, twins.py:367, indexes context[j % B] instead — identical at
        # B == 1, i.e. every reference inference path, but it cross-wires
        # samples for B > 1; we use the correct indexing, which also makes
        # the batched bidirectional flow pass exact.)
        ctx = jnp.repeat(context, k_tok, axis=0)  # (B*K, H1, W1, 256)

        for idx in range(self.depth):
            x = LatentSelfAttentionLayer(
                self.latent_dim, name=f"encoder_layers_{idx}"
            )(x)
            # (B*H1W1, K, D) -> (B*K, H1W1, D) (`encoder.py:450-455`)
            xv = x.reshape(b, h1 * w1, k_tok, self.latent_dim)
            xv = xv.transpose(0, 2, 1, 3).reshape(b * k_tok, h1 * w1, self.latent_dim)
            xv = VerticalSelfAttentionLayer(
                self.latent_dim, name=f"vertical_encoder_layers_{idx}"
            )(xv, (h1, w1), ctx)
            x = xv.reshape(b, k_tok, h1 * w1, self.latent_dim)
            x = x.transpose(0, 2, 1, 3).reshape(b * h1 * w1, k_tok, self.latent_dim)

        x = x + short_cut  # cost_encoder_res (`encoder.py:463-465`)
        return x, cost_maps


# ----------------------------------------------------------- memory encoder
class MemoryEncoder(nn.Module):
    """`encoder.py:469-539`: twins features -> all-pairs cost volume ->
    cost perceiver. cost_heads_num=1 (config).

    bidir=True processes BOTH flow directions in one batched pass: the
    reverse cost volume is the transpose of the forward one (one matmul
    instead of two; exact — FlowFormer has no batch-coupled ops)."""

    @nn.compact
    def __call__(self, img1: Array, img2: Array, context: Array,
                 bidir: bool = False):
        n = img1.shape[0]
        feats, _ = TwinsSVTLarge2Stage(name="feat_encoder")(
            jnp.concatenate([img1, img2], axis=0)
        )
        feats = nn.Conv(256, (1, 1), use_bias=False, name="channel_convertor")(feats)
        feat_s, feat_t = feats[:n], feats[n:]

        b, h, w, c = feat_s.shape
        # all-pairs cost, NO sqrt(dim) scaling (`encoder.py:485-503`)
        corr = jnp.einsum(
            "bic,bjc->bij",
            feat_s.reshape(b, h * w, c),
            feat_t.reshape(b, h * w, c),
            preferred_element_type=jnp.float32,
        )
        if bidir:
            cost_volume = jnp.concatenate(
                [corr, corr.transpose(0, 2, 1)], axis=0
            ).reshape(2 * b, h, w, h, w)
            ffeat = feats  # [I0-features; I1-features]
        else:
            cost_volume = corr.reshape(b, h, w, h, w)
            ffeat = feat_s

        memory, cost_maps = CostPerceiverEncoder(name="cost_perceiver_encoder")(
            cost_volume, context
        )
        return memory, cost_maps, ffeat


# ----------------------------------------------------------------- GMA
class GMAAttention(nn.Module):
    """Content self-similarity attention over context (`gma.py:32-76`),
    heads=1, dim_head=128. (RelPosEmb is frozen AND unused in the forward —
    its checkpoint tensors are skipped by the converter.)"""

    heads: int = 1
    dim_head: int = 128

    @nn.compact
    def __call__(self, fmap: Array) -> Array:
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        qk = nn.Conv(2 * inner, (1, 1), use_bias=False, name="to_qk")(fmap)
        q, k = qk[..., :inner], qk[..., inner:]
        q = q.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q * (self.dim_head**-0.5), k)
        return jax.nn.softmax(sim, axis=-1)  # (B, heads, HW, HW)


class GMAAggregate(nn.Module):
    """`gma.py:79-115`: out = fmap + gamma * (attn @ v)."""

    heads: int = 1
    dim_head: int = 128

    @nn.compact
    def __call__(self, attn: Array, fmap: Array) -> Array:
        b, h, w, c = fmap.shape
        inner = self.heads * self.dim_head
        v = nn.Conv(inner, (1, 1), use_bias=False, name="to_v")(fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma * out


# --------------------------------------------------------------- update gru
class FFMotionEncoder(nn.Module):
    """BasicMotionEncoder with cor_planes = 81 + query_latent_dim
    (`gru.py:76-98`)."""

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        cor = nn.relu(Conv2d(256, 1, 1, 0, name="convc1")(corr))
        cor = nn.relu(Conv2d(192, 3, 1, 1, name="convc2")(cor))
        flo = nn.relu(Conv2d(128, 7, 1, 3, name="convf1")(flow))
        flo = nn.relu(Conv2d(64, 3, 1, 1, name="convf2")(flo))
        out = nn.relu(
            Conv2d(126, 3, 1, 1, name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], -1)


class GMAUpdateBlock(nn.Module):
    """`gru.py:130-160`: motion encoder + GMA aggregate + SepConvGRU + flow
    head. The reference's per-iteration upsample-mask head is hoisted out of
    the 32-iter loop (only the final mask is consumed, discarded masks carry
    zero gradient — see FFMaskHead)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        motion = FFMotionEncoder(name="encoder")(flow, corr)
        motion_global = GMAAggregate(name="aggregator")(attention, motion)
        inp_cat = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, inp_cat)
        h = nn.relu(Conv2d(256, 3, 1, 1, name="flow_head_conv1")(net))
        delta_flow = Conv2d(2, 3, 1, 1, name="flow_head_conv2")(h)
        return net, delta_flow


class FFMaskHead(nn.Module):
    """Convex-upsample mask head (`gru.py:152-156`), applied ONCE to the
    final decoder hidden state (see GMAUpdateBlock docstring)."""

    @nn.compact
    def __call__(self, net: Array) -> Array:
        m = nn.relu(Conv2d(256, 3, 1, 1, name="mask_0")(net))
        return 0.25 * Conv2d(64 * 9, 1, 1, 0, name="mask_2")(m)


# ------------------------------------------------------------ memory decoder
class DecoderCrossAttention(nn.Module):
    """`decoder.py:35-120` minus the k/v projections (those are
    loop-invariant and owned by MemoryDecoder). query/coord_pe: (B', 1, Dq);
    key/value: (B', M, Dq)."""

    query_dim: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, query, key, value, coord_pe):
        short_cut = query
        q_in = nn.LayerNorm(epsilon=EPS5, name="norm1")(query)
        q = nn.Dense(self.query_dim, name="q")(q_in + coord_pe)
        x = _mha(q, key, value, self.heads)
        x = nn.Dense(self.query_dim, name="proj")(
            jnp.concatenate([x, short_cut], axis=-1)
        )
        x = short_cut + x
        return x + FFN(self.query_dim, name="ffn")(
            nn.LayerNorm(epsilon=EPS5, name="norm2")(x)
        )


class _DecoderStep(nn.Module):
    """One memory-decoder iteration, shaped for nn.scan
    (`decoder.py:284-316`). carry = (net, coords1) + invariants."""

    query_dim: int = 64

    @nn.compact
    def __call__(self, carry, _):
        net, coords1, inp, coords0, attention, key, value, pyramid = carry
        coords1 = jax.lax.stop_gradient(coords1)
        b, h1, w1, _ = coords1.shape

        cost_forward = corr_ops.corr_lookup(
            corr_ops.CorrPyramid(pyramid), coords1, radius=4
        )  # (B, H1, W1, 81) — encode_flow_token (`decoder.py:237-255`)

        q = Conv2d(self.query_dim, 1, 1, 0, name="flow_token_encoder_0")(cost_forward)
        q = jax.nn.gelu(q, approximate=False)
        q = Conv2d(self.query_dim, 1, 1, 0, name="flow_token_encoder_2")(q)
        query = q.reshape(b * h1 * w1, 1, self.query_dim)

        pe = linear_pe(coords1.reshape(b * h1 * w1, 1, 2), self.query_dim)
        x = DecoderCrossAttention(self.query_dim, name="cross")(query, key, value, pe)
        cost_global = x.reshape(b, h1, w1, self.query_dim)

        corr = jnp.concatenate([cost_global, cost_forward], axis=-1)
        flow = coords1 - coords0
        net, delta_flow = GMAUpdateBlock(name="update_block")(
            net, inp, corr, flow, attention
        )
        coords1 = coords1 + delta_flow
        return (
            net, coords1, inp, coords0, attention, key, value, pyramid
        ), None


class MemoryDecoder(nn.Module):
    """`decoder.py:201-321`: recurrent flow decoding from the cost memory."""

    depth: int = 32
    query_dim: int = 64

    @nn.compact
    def __call__(self, memory, context, cost_maps):
        b, h1, w1, _ = context.shape
        context = Conv2d(256, 1, 1, 0, name="proj")(context)
        net = jnp.tanh(context[..., :128])
        inp = nn.relu(context[..., 128:])
        attention = GMAAttention(name="att")(inp)

        # loop-invariant k/v over the cost memory, computed ONCE
        # (the reference caches them after iter 0, `decoder.py:87-89,296`)
        key = nn.Dense(self.query_dim, name="cross_k")(memory)
        value = nn.Dense(self.query_dim, name="cross_v")(memory)

        coords0 = coords_grid(b, h1, w1)
        pyramid = (cost_maps.reshape(b, h1 * w1, *cost_maps.shape[1:3]),)

        scan = nn.scan(
            _DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.depth,
        )
        carry = (net, coords0, inp, coords0, attention, key, value, pyramid)
        carry, _ = scan(self.query_dim, name="step")(carry, None)
        net, coords1 = carry[:2]
        up_mask = FFMaskHead(name="mask_head")(net)

        flow_lowres = coords1 - coords0
        flow_up = convex_upsample_8x(flow_lowres, up_mask)
        return flow_up, flow_lowres


# ---------------------------------------------------------------- top level
class FlowFormer(nn.Module):
    """`transformer.py:28-74`. Input images in [0, 255], NHWC.

    Returns (flow_up, [cfeat_1/4 (128ch), cfeat_1/8 (256ch)], ffeat (256ch))
    matching the reference's return_feat=True contract
    (`transformer.py:56-74`).
    """

    iters: int = 32

    @nn.compact
    def __call__(self, image1: Array, image2: Array, train: bool = False,
                 bidir: bool = False):
        """bidir=True: both directions batched (rows :N forward, N: backward)
        — the context encoder and the cost matmul run once, exactly."""
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        ctx_in = jnp.concatenate([image1, image2], axis=0) if bidir else image1
        context, cfeat = TwinsSVTLarge2Stage(name="context_encoder")(ctx_in)
        memory, cost_maps, ffeat = MemoryEncoder(name="memory_encoder")(
            image1, image2, context, bidir=bidir
        )
        flow_up, _ = MemoryDecoder(self.iters, name="memory_decoder")(
            memory, context, cost_maps
        )
        return flow_up, cfeat, ffeat
