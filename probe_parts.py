"""Time individual ops on the TPU to find the runtime bottleneck."""

import time

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=3):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms", flush=True)


def main():
    from gimmvfi_tpu.ops.softsplat import _splat_core, softsplat
    from gimmvfi_tpu.ops import corr as corr_ops
    from gimmvfi_tpu.ops.coords import coords_grid
    from gimmvfi_tpu.ops.interp import warp, resize_bilinear

    key = jax.random.PRNGKey(0)
    h = w = 128

    x = jax.random.normal(key, (1, h, w, 16))
    flow = jax.random.normal(key, (1, h, w, 2)) * 3
    metric = jax.random.normal(key, (1, h, w, 1))
    bench("splat_core 128^2 c17", _splat_core, jnp.concatenate([x, metric], -1), flow)
    bench("warp 128^2 c16", warp, x, flow)
    bench("resize up2 128^2", lambda a: resize_bilinear(a, (256, 256)), x)

    f1 = jax.random.normal(key, (1, h // 8, w // 8, 256))
    f2 = jax.random.normal(key, (1, h // 8, w // 8, 256))
    coords = coords_grid(1, h // 8, w // 8)

    def corr_full(f1, f2, coords):
        pyr = corr_ops.corr_pyramid(f1, f2, 4)
        return corr_ops.corr_lookup(pyr, coords, 4)

    bench("corr pyramid+lookup 16^2", corr_full, f1, f2, coords)

    f1b = jax.random.normal(key, (1, 92, 160, 256))
    f2b = jax.random.normal(key, (1, 92, 160, 256))
    coordsb = coords_grid(1, 92, 160)
    bench("corr pyramid+lookup 92x160 (720p/8)", corr_full, f1b, f2b, coordsb)

    xb = jax.random.normal(key, (1, 736, 1280, 16))
    flowb = jax.random.normal(key, (1, 736, 1280, 2)) * 10
    metricb = jax.random.normal(key, (1, 736, 1280, 1))
    bench(
        "splat_core 720p c17",
        _splat_core,
        jnp.concatenate([xb, metricb], -1),
        flowb,
    )
    bench("warp 720p c16", warp, xb, flowb)

    from gimmvfi_tpu.flow.raft import RAFT

    raft = RAFT(iters=20)
    img = jax.random.uniform(key, (1, h, w, 3)) * 255
    vars_shapes = jax.eval_shape(raft.init, key, img, img)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vars_shapes)
    bench("raft 128^2 20it", lambda v, a, b: raft.apply(v, a, b)[0], variables, img, img)


if __name__ == "__main__":
    main()
