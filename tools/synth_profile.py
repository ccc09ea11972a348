"""frame_synthesize internals breakdown at 720p (TPU, readback timing)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
from gimmvfi_tpu.models.synthesis import multi_flow_combine
from gimmvfi_tpu.ops.coords import coords_grid
from gimmvfi_tpu.ops.interp import resize, warp


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:8.1f} ms")
    return ms


def main():
    h, w = 736, 1280
    dt = jnp.bfloat16
    model = GIMMVFI_R(raft_iters=2, dtype=dt, remat=False)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    var_shapes = jax.eval_shape(lambda r, x: model.init(r, x, (0.5,)), rng, small)
    key = jax.random.PRNGKey(2)
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, jnp.float32) * 0.02).astype(s.dtype)
        if s.dtype == jnp.float32
        else jnp.zeros(s.shape, s.dtype),
        var_shapes,
    )

    key = jax.random.PRNGKey(1)
    img0 = jax.random.uniform(key, (1, h, w, 3))
    img1 = jax.random.uniform(key, (1, h, w, 3))
    f18_256 = jax.random.normal(key, (1, h // 8, w // 8, 256), dt)
    f14_128 = jax.random.normal(key, (1, h // 4, w // 4, 128), dt)
    flow_4 = jax.random.normal(key, (1, h // 4, w // 4, 2), jnp.float32) * 4
    ft4 = jax.random.normal(key, (1, h // 4, w // 4, 128), dt)
    mask4 = jax.random.normal(key, (1, h // 4, w // 4, 1), jnp.float32)
    corr4 = jax.random.normal(key, (1, h // 8, w // 8, 648), dt)

    def up8(v, f):
        return model.apply(
            v, f,
            method=lambda m, a: m.amt_init_decoder(
                a, None, None, None, None, None, False, True
            ),
        )

    timed(up8, variables, jnp.concatenate([f18_256, f18_256], 0),
          name="InitDecoder UpsampleHead (t-invariant, in prepare)")
    f8u = jax.jit(up8)(variables, f18_256)

    def up4(v, f):
        return model.apply(
            v, f,
            method=lambda m, a: m.amt_final_decoder(
                a, None, None, None, None, None, None, None, False, True
            ),
        )

    timed(up4, variables, jnp.concatenate([f14_128, f14_128], 0),
          name="MultiFlowDecoder UpsampleHead (t-invariant, in prepare)")
    f4u = jax.jit(up4)(variables, f14_128)

    def initdec(v, f0, f1, fl0, fl1, i0, i1):
        return model.apply(
            v, f0, f1, fl0, fl1, i0, i1,
            method=lambda m, *a: m.amt_init_decoder(*a, False, False),
        )

    fl8 = resize(flow_4, 0.5) * 0.5
    timed(initdec, variables, f8u, f8u, flow_4, flow_4, img0, img1,
          name="InitDecoder (1/8->1/4, warps, 3 ResBlocks@128)")

    def corr_lookup_stage(v, fl0, fl1):
        lookup = coords_grid(1, h // 8, w // 8)
        pyr = model.apply(
            v, f18_256, f18_256,
            method=lambda m, a, b: __import__(
                "gimmvfi_tpu.ops.corr", fromlist=["bidir_corr_pyramid"]
            ).bidir_corr_pyramid(m.amt_fproj(a), m.amt_fproj(b)),
        )
        return model.apply(
            v, pyr, lookup, fl0, fl1, jnp.full((1, 1, 1, 1), 0.5),
            method=lambda m, *a: m._corr_scale_lookup(*a)[0],
        )

    timed(corr_lookup_stage, variables, flow_4, flow_4,
          name="bidir pyramid + corr_scale_lookup")

    def upd_low(v, ft, fl, co):
        return model.apply(v, ft, jnp.concatenate([fl, fl], -1), co,
                           method=lambda m, *a: m.amt_update4_low(*a))

    ft4_128 = jax.random.normal(key, (1, h // 4, w // 4, 128), dt)
    flow_8 = 0.5 * resize(flow_4, 0.5)
    corr4_up = resize(corr4, 2.0)
    timed(upd_low, variables, ft4_128, flow_8, corr4,
          name="update4_low (internal 2x downscale)")

    def upd_high(v, ft, fl, co):
        return model.apply(v, ft, jnp.concatenate([fl, fl], -1), co,
                           method=lambda m, *a: m.amt_update4_high(*a))

    timed(upd_high, variables, ft4_128, flow_4, corr4_up,
          name="update4_high (full 1/4 res)")

    timed(lambda c: resize(c, 2.0), corr4, name="corr resize 2x (648ch @1/8)")

    def mfd(v, ft, f0, f1, fl0, fl1, m4, i0, i1):
        return model.apply(
            v, ft, f0, f1, fl0, fl1, m4, i0, i1,
            method=lambda m, *a: m.amt_final_decoder(*a, False, False),
        )

    timed(mfd, variables, ft4, f4u, f4u, flow_4, flow_4, mask4,
          img0, img1, name="MultiFlowDecoder (1/4->1/1, 3 ResBlocks@256)")

    flow1 = jax.random.normal(key, (1, h, w, 6), jnp.float32) * 4
    maskf = jax.random.normal(key, (1, h, w, 3), jnp.float32)
    res3 = jax.random.normal(key, (1, h, w, 9), jnp.float32)

    def mfc(v, i0, i1, fl0, fl1, mk, rs):
        return model.apply(
            v, i0, i1, fl0, fl1, mk, rs,
            method=lambda m, *a: multi_flow_combine(m.amt_comb_block, *a),
        )

    timed(mfc, variables, img0, img1, flow1, flow1, maskf, res3,
          name="multi_flow_combine (6 warps + CombBlock)")

    def wwm(v, i0, i1, f0, f1, mk):
        return model.apply(
            v, i0, i1, f0, f1, mk,
            method=lambda m, *a: m.warp_w_mask(*a, scale=4),
        )

    timed(wwm, variables, img0, img1, flow_4, flow_4, mask4,
          name="warp_w_mask (2 full-res warps)")


if __name__ == "__main__":
    main()
