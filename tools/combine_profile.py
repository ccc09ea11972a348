"""Sub-op breakdown of multi_flow_combine and MultiFlowDecoder at 720p.

Separates descriptor-bound warp gathers from conv work and from glue
(regroup transposes, blends), so kernel effort goes where the time is.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
from gimmvfi_tpu.ops.interp import warp, resize


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.1f} ms")
    return ms


def main():
    h, w = 736, 1280
    k = 3
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = GIMMVFI_R(raft_iters=2, dtype=dt)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    var_shapes = jax.eval_shape(lambda r, x: model.init(r, x, (0.5,)), rng, small)
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, jnp.float32) * 0.02).astype(s.dtype),
        var_shapes,
    )

    i0 = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    f_nk2 = jax.random.normal(key, (k, h, w, 2), jnp.float32) * 8
    i0_rep = jnp.repeat(i0, k, axis=0)

    # (a) the warps alone: 2 x (K, H, W, 3) border-mode gathers
    def warps_only(a, f):
        return warp(a, f) + warp(a, f + 1.0)

    timed(warps_only, i0_rep, f_nk2, name="2x warp (K=3 batch, 3ch, full res) = 6 warps")

    def one_warp(a, f):
        return warp(a, f)

    timed(one_warp, i0_rep, f_nk2, name="1x warp (K=3 batch, 3ch, full res) = 3 warps")

    # 67-ch warp as in MultiFlowDecoder f_in assembly
    f67 = jax.random.normal(key, (1, h, w, 67), dt)
    fl2 = jax.random.normal(key, (1, h, w, 2), jnp.float32) * 8
    timed(one_warp, f67, fl2, name="1x warp (67ch bf16, full res)")

    # (b) CombBlock alone (7x7 convs at 9->18->3 ch full res)
    stacked = jax.random.normal(key, (1, h, w, 3 * k), jnp.float32)

    def comb(v, x):
        return model.apply(
            v, x, method=lambda m, a: m.comb_block(a)
        )

    timed(comb, variables, stacked, name="CombBlock (7x7 9->18, PReLU, 7x7 18->3)")

    # (c) the blend glue: regroups + lerp + mean (no warps, no convs)
    flow0 = jax.random.normal(key, (1, h, w, 2 * k), jnp.float32) * 8
    mask = jax.random.uniform(key, (1, h, w, k), jnp.float32)
    res = jax.random.normal(key, (1, h, w, 3 * k), jnp.float32) * 0.05

    def glue(fl0, m, r):
        n = 1
        f0 = fl0.reshape(n, h, w, k, 2).transpose(0, 3, 1, 2, 4).reshape(n * k, h, w, 2)
        mm = m.reshape(n, h, w, k, 1).transpose(0, 3, 1, 2, 4).reshape(n * k, h, w, 1)
        rr = r.reshape(n, h, w, k, 3).transpose(0, 3, 1, 2, 4).reshape(n * k, h, w, 3)
        iw = mm * rr + (1 - mm) * rr + rr
        iw = iw.reshape(n, k, h, w, 3)
        st = iw.transpose(0, 2, 3, 1, 4).reshape(n, h, w, k * 3)
        return st + iw.mean(axis=1)

    timed(glue, flow0, mask, res, name="combine glue (regroups + blend + mean)")

    # (d) MultiFlowDecoder pieces: f_in assembly vs conv stack
    f64 = jax.random.normal(key, (1, h, w, 64), dt)
    ft4 = jax.random.normal(key, (1, h // 4, w // 4, 128), dt)
    m4 = jax.random.uniform(key, (1, h // 4, w // 4, 1), jnp.float32)
    fl4 = jax.random.normal(key, (1, h // 4, w // 4, 2), jnp.float32) * 2

    def f_in_assembly(f0, f1, ft, m, fl):
        flow0 = 4.0 * resize(fl, 4.0)
        flow1 = 4.0 * resize(fl, 4.0)
        ftu = resize(ft, 4.0)
        mu = resize(m, 4.0)
        c_f = f0.shape[-1]
        w0_all = warp(jnp.concatenate([f0, i0.astype(f0.dtype)], -1), flow0)
        w1_all = warp(jnp.concatenate([f1, i0.astype(f1.dtype)], -1), flow1)
        return jnp.concatenate(
            [ftu, w0_all[..., :c_f], w1_all[..., :c_f], flow0, flow1, mu,
             i0.astype(f0.dtype), i0.astype(f0.dtype),
             w0_all[..., c_f:], w1_all[..., c_f:]], -1
        )

    timed(f_in_assembly, f64, f64, ft4, m4, fl4,
          name="MFD f_in assembly (2x 67ch warps + 4x resizes)")

    f_in = jax.random.normal(key, (1, h, w, 276), dt)

    def conv_stack(v, x):
        import flax.linen as nn

        def run(m, a):
            from gimmvfi_tpu.models.synthesis import ConvPReLU, _ResBlockR
            from gimmvfi_tpu.nn.layers import Conv2d
            c = m.amt_final_decoder.in_ch * 2
            return m.amt_final_decoder(
                None, None, None, None, None, None, None, None, False, False
            )

        # time via direct module calls on a scope: simpler to rebuild inline
        return None

    # conv stack timed via the synth_profile MFD row minus assembly instead.

    print("(conv stack = MFD row in synth_profile minus f_in assembly row)")


if __name__ == "__main__":
    main()
