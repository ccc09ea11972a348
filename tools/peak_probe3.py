"""Calibrate per-call dispatch overhead vs in-jit op cost on the axon tunnel.

Times each workload two ways: K separate jit calls vs ONE jit program that
chains K dependent repetitions. The difference isolates the per-dispatch
floor from true device time; the chained numbers are representative of the
production pipeline (one big jit program).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def readback(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timed_calls(fn, *args, iters=8, name=""):
    f = jax.jit(fn)
    readback(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    readback(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:9.3f} ms/call")
    return ms


def timed_chain(fn, *args, k=8, name="", flops=None, bytes_rw=None):
    def chained(*a):
        x = a[0]
        for _ in range(k):
            x = fn(x, *a[1:])
        return x

    f = jax.jit(chained)
    readback(f(*args))
    t0 = time.perf_counter()
    out = f(*args)
    readback(out)
    ms = (time.perf_counter() - t0) / k * 1e3
    extra = ""
    if flops:
        extra += f" {flops / ms / 1e9:7.1f} TFLOP/s"
    if bytes_rw:
        extra += f" {bytes_rw / ms / 1e6:7.1f} GB/s"
    print(f"{name:58s} {ms:9.3f} ms/rep{extra}")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # 1. dispatch floor: trivial op
    tiny = jnp.ones((8, 128), jnp.float32)
    timed_calls(lambda x: x + 1.0, tiny, name="tiny add (dispatch floor, per separate call)")

    # 2. peak matmul: 4096^3 bf16 (137 GFLOP) chained
    a = jax.random.normal(key, (4096, 4096), dt)
    fl = 2 * 4096**3
    timed_chain(
        lambda x: jnp.dot(x, a, preferred_element_type=jnp.float32).astype(dt),
        a, k=16, name="4096^3 bf16 matmul (chained in one jit)", flops=fl,
    )

    # 3. HBM bandwidth: elementwise on 256ch 736x1280 bf16, chained
    x256 = jax.random.normal(key, (1, 736, 1280, 256), dt)
    nbytes = 2 * x256.size * 2
    timed_chain(lambda x: x * 1.0001 + 0.1, x256, k=16,
                name="elementwise @736x1280x256 bf16 (chained)", bytes_rw=nbytes)

    # 4. the hot conv, chained inside ONE jit (production-representative)
    k33 = jax.random.normal(key, (3, 3, 256, 256), dt)

    def conv33(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)

    fl = 736 * 1280 * 256 * 256 * 9 * 2
    timed_chain(conv33, x256, k33, k=8,
                name="3x3 conv 256ch @736x1280 bf16 (chained)", flops=fl)

    # 5. conv as 9 shifted matmuls (chained): does bypassing the conv
    # lowering help?
    w9 = jax.random.normal(key, (9, 256, 256), dt)

    def conv_as_mm(x, w):
        n, h, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n, h, ww, 256), jnp.float32)
        i = 0
        for dy in range(3):
            for dx in range(3):
                sh = xp[:, dy : dy + h, dx : dx + ww]
                acc = acc + jnp.einsum(
                    "nhwc,cd->nhwd", sh, w[i],
                    preferred_element_type=jnp.float32,
                )
                i += 1
        return acc.astype(dt)

    timed_chain(conv_as_mm, x256, w9, k=8,
                name="same conv as 9 shifted matmuls (chained)", flops=fl)

    # 6. batch-8 strips variant chained (halo'd row tiles)
    def conv33_s2b(x, k):
        n, hh, ww, c = x.shape
        t = 8
        th = hh // t
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        tiles = jnp.stack(
            [xp[:, i * th : i * th + th + 2] for i in range(t)], 1
        ).reshape(n * t, th + 2, ww, c)
        y = jax.lax.conv_general_dilated(
            tiles, k, (1, 1), [(0, 0), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        return y.reshape(n, t * th, ww, c)

    timed_chain(conv33_s2b, x256, k33, k=8,
                name="conv 8 row-tiles batched (chained)", flops=fl)

    # 7. f32 conv for comparison
    x256f = x256.astype(jnp.float32)
    k33f = k33.astype(jnp.float32)

    def conv33f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timed_chain(conv33f, x256f, k33f, k=4,
                name="3x3 conv 256ch f32 (chained)", flops=fl)


if __name__ == "__main__":
    main()
