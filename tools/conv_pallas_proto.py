"""Prototype: 3x3 SAME conv as 9 shifted MXU matmuls in Pallas.

XLA's conv at (1, 736, 1280, 256)x(3,3,256,256) bf16 runs ~20 ms (53
TFLOP/s, 27% MFU). Roofline: 1.11 TFLOP / 197 TFLOP/s = 5.7 ms + ~1.3 ms
HBM. This prototype flattens NHWC to rows=(pixels), lanes=(channels), pads
the width to a sublane-aligned Wp, and computes out = sum_o X[p+off_o] @
W_o per row-group tile, with the halo handled by loading (R+2) image rows.

Variant A: 9 matmuls on sublane-offset slices of the window (3 unaligned).
Variant B: 3 aligned dy-matmul groups + sublane-shifted accumulator adds.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 256
R = 2  # image rows per grid step


def _kernel(x_hbm, w_ref, o_ref, xw, sem, *, wp: int, variant: str):
    i = pl.program_id(0)
    t = R * wp
    win = t + 2 * wp + 8
    # x_hbm leads with wp+1 zero rows: for output pixel p (flat, image
    # space) tap (dy, dx) reads xf row p + (dy-1)*wp + dx + (wp+1), so
    # window [i*t, i*t + win) serves tile i with in-window tap offset
    # dy*wp + dx + 1 for dy in {0,1,2}.
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * t, win), :], xw, sem)
    cp.start()
    cp.wait()

    f32 = jnp.float32
    if variant == "A":
        acc = jnp.zeros((t, C), f32)
        for dy in (0, 1, 2):
            for dx in (-1, 0, 1):
                off = dy * wp + 1 + dx
                acc += jax.lax.dot_general(
                    xw[pl.ds(off, t), :],
                    w_ref[3 * dy + dx + 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        o_ref[:] = acc.astype(o_ref.dtype)
    else:
        # aligned dy-slices (wp % 8 == 0) + dx applied by shifting the f32
        # partial results (3 unaligned value slices instead of 6)
        z = []
        for dx in (-1, 0, 1):
            acc = jnp.zeros((t + 8, C), f32)
            for dy in (0, 1, 2):
                acc += jax.lax.dot_general(
                    xw[pl.ds(dy * wp, t + 8), :],
                    w_ref[3 * dy + dx + 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            z.append(acc)
        # out[p] = sum_dx Z_dx[p + dx + 1]
        out = z[0][0:t] + z[1][1 : t + 1] + z[2][2 : t + 2]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "variant"))
def conv3x3_pallas(x, w9, h: int, w: int, variant: str = "A"):
    """x: (1, h, w, C) bf16; w9: (3, 3, C, C) HWIO bf16 -> (1, h, w, C)."""
    pad = 4
    wp = w + 2 * pad  # multiple of 8 when w % 8 == 0
    n_tiles = -(-h // R)
    xf = jnp.pad(
        x[0], [(0, n_tiles * R - h), (pad, pad), (0, 0)]
    ).reshape(n_tiles * R * wp, C)
    # wp+1 zero lead rows (see kernel comment); tail slack so the last
    # window [i*t, i*t + t + 2*wp + 8) stays in-bounds
    xf = jnp.pad(xf, [(wp + 1, 2 * wp + 8 - 1), (0, 0)])
    wk = w9.reshape(9, C, C)
    out = pl.pallas_call(
        functools.partial(_kernel, wp=wp, variant=variant),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R * wp, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * R * wp, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R * wp + 2 * wp + 8, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xf, wk)
    out = out.reshape(n_tiles * R, wp, C)[:h, pad : pad + w]
    return out[None]


def conv3x3_xla(x, w9):
    return jax.lax.conv_general_dilated(
        x, w9, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def timed(fn, *args, iters=5, name="", flops=None):
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    try:
        float(jnp.asarray(f(*args)).mean())
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(out).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    tf = f" {flops / ms / 1e9:7.1f} TFLOP/s" if flops else ""
    print(f"{name:52s} {ms:8.2f} ms{tf}")
    return ms


def main():
    h, w = 736, 1280
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, C), jnp.bfloat16)
    w9 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05

    ref = jax.jit(conv3x3_xla)(x, w9)
    fl = 2 * 9 * C * C * h * w

    timed(conv3x3_xla, x, w9, name="XLA conv 3x3 256ch bf16", flops=fl)

    for variant in ("A", "B"):
        fn = jax.jit(
            functools.partial(conv3x3_pallas, h=h, w=w, variant=variant)
        )
        ms = timed(fn, x, w9, name=f"pallas variant {variant}", flops=fl)
        if ms:
            got = fn(x, w9)
            d = float(
                jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
            )
            print(f"{'':52s} max diff vs XLA: {d:.2e}")


if __name__ == "__main__":
    main()
