"""Fine-grained decode_one breakdown at 720p on the TPU.

Times splat_fuse_latents, HypoNet decode, and frame_synthesize separately
(plus synthesis internals) using real `prepare` outputs, with scalar
readback timing (the axon tunnel's block_until_ready lies).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
from gimmvfi_tpu.models.gimm_core import splat_fuse_latents
from gimmvfi_tpu.ops.coords import sample_coords_3d, unnormalize_flow


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:50s} {ms:8.1f} ms")
    return ms


def main():
    h, w = 736, 1280
    model = GIMMVFI_R(raft_iters=20, dtype=jnp.bfloat16, remat=False)
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
    img_xs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, h, w, 3))

    prep = jax.jit(lambda v, x: model.apply(v, x, None, method=model.prepare))(
        variables, img_xs
    )
    prep = jax.tree_util.tree_map(lambda x: x, prep)  # materialize
    tv = jnp.float32(0.5)

    def splat(v, prep, tv):
        t = jnp.broadcast_to(tv.reshape(-1), (1,))
        return model.apply(
            v,
            prep["latent0"], prep["latent1"], prep["flow01"], prep["flow10"],
            prep["w1"], prep["w2"], t,
            method=lambda m, *a: splat_fuse_latents(m.res_conv, *a, m.fwarp_type),
        )

    t_splat = timed(splat, variables, prep, tv, name="splat_fuse_latents (2 splats + refiner)")

    pixel_latent = jax.jit(splat)(variables, prep, tv)

    def hypo(v, pl_, tv):
        coord = sample_coords_3d(1, (h, w), tv, model.coord_range)
        return model.apply(v, coord, pl_, method=lambda m, c, p: m.hyponet(c, p))

    t_hypo = timed(hypo, variables, pixel_latent, tv, name="hyponet decode (941k coords)")

    ninr = jax.jit(hypo)(variables, pixel_latent, tv)

    def synth(v, prep, ninr, tv):
        flow_t = unnormalize_flow(ninr, prep["scalers"])[:, 0]
        t = jnp.broadcast_to(tv.reshape(-1), (1,))
        return model.apply(
            v,
            prep["img_xs"], flow_t, prep["f8_up"], prep["f4_up"],
            prep["corr_pyrs"], t.reshape(1, 1, 1, 1),
            method=lambda m, *a: m.frame_synthesize(*a),
        )["imgt_pred"]

    t_synth = timed(synth, variables, prep, ninr, tv, name="frame_synthesize (AMT full)")

    print(f"sum: {t_splat + t_hypo + t_synth:.1f} ms")


if __name__ == "__main__":
    main()
