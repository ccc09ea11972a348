"""Calibrate TPU gather/sort primitives for the warp-kernel design.

Measures (on the real chip):
  - take_along_axis descriptor rate vs row width (8 / 32 / 128 lanes)
  - take_along_axis with sorted (contiguous-ish) vs random indices
  - lax.sort_key_val rate at 941k and 5.65M keys
  - whether Mosaic lowers jnp.take_along_axis inside a Pallas kernel
    (sublane-dim gather), and its rate if it does
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    try:
        float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    except Exception as e:
        print(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.2f} ms")
    return ms


def main():
    p = 941_056  # ~720p pixel count
    key = jax.random.PRNGKey(0)
    idx_rand = jax.random.randint(key, (1, p), 0, p).astype(jnp.int32)
    idx_near = jnp.clip(
        jnp.arange(p, dtype=jnp.int32)[None]
        + jax.random.randint(key, (1, p), -64, 64),
        0,
        p - 1,
    )

    for width in (8, 32, 128):
        src = jax.random.normal(key, (1, p, width), jnp.float32)

        def take(s, i):
            return jnp.take_along_axis(s, i[..., None], axis=1)

        ms = timed(take, src, idx_rand,
                   name=f"take_along_axis random idx, {width} lanes f32")
        if ms:
            print(f"{'':58s} -> {ms / p * 1e6:.1f} ns/row")
        timed(take, src, idx_near, name=f"take_along_axis near-diag idx, {width} lanes")

    src8 = jax.random.normal(key, (1, p, 8), jnp.bfloat16)

    def take_bf16(s, i):
        return jnp.take_along_axis(s, i[..., None], axis=1)

    timed(take_bf16, src8, idx_rand, name="take_along_axis random idx, 8 lanes bf16")

    # sort rates
    for n in (p, 6 * p):
        keys = jax.random.randint(key, (n,), 0, n).astype(jnp.int32)
        payload = jnp.arange(n, dtype=jnp.int32)

        def srt(k, v):
            return jax.lax.sort_key_val(k, v)

        timed(srt, keys, payload, name=f"sort_key_val int32 n={n}")

    # pallas sublane gather probe: out[i, j] = x[idx[i, j], j]
    rows, lanes = 512, 128

    def subgather_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jax.random.normal(key, (rows, lanes), jnp.float32)
    idx = jax.random.randint(key, (rows, lanes), 0, rows).astype(jnp.int32)

    def subgather(x, idx):
        return pl.pallas_call(
            subgather_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        )(x, idx)

    timed(subgather, x, idx, name=f"pallas sublane take_along_axis ({rows}x{lanes})")

    # same but a big batch to measure rate (grid over tiles)
    bigr = 8192

    def subgather_big_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    xb = jax.random.normal(key, (bigr, lanes), jnp.float32)
    idxb = jax.random.randint(key, (bigr, lanes), 0, 8).astype(jnp.int32) + (
        jnp.arange(bigr, dtype=jnp.int32)[:, None] // 8 * 8
    ) % bigr

    def subgather_grid(x, idx):
        return pl.pallas_call(
            subgather_big_kernel,
            grid=(bigr // 512,),
            in_specs=[
                pl.BlockSpec((512, lanes), lambda i: (i, 0)),
                pl.BlockSpec((512, lanes), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((512, lanes), lambda i: (i, 0)),
        )(x, (idx % 512))

    timed(subgather_grid, xb, idxb, name="pallas sublane gather grid (8192x128, idx<512)")

    # pallas lane gather probe: out[i, j] = x[i, idx[i, j]]
    def lanegather_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    idxl = jax.random.randint(key, (rows, lanes), 0, lanes).astype(jnp.int32)

    def lanegather(x, idx):
        return pl.pallas_call(
            lanegather_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        )(x, idx)

    timed(lanegather, x, idxl, name=f"pallas lane take_along_axis ({rows}x{lanes})")


if __name__ == "__main__":
    main()
