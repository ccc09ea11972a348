"""Probe achievable peaks on this chip: MXU bf16 matmul, HBM stream, call overhead.

Grounds every other microbench: if a lone 8k x 8k matmul hits X TFLOP/s and a
pure elementwise stream hits Y GB/s, those are the practical ceilings the
kernels compete against (v5e paper specs: 197 bf16 TFLOP/s, 819 GB/s).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_ms(fn, *args, iters=10):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)

    # call + readback overhead: trivially small op
    tiny = jnp.zeros((8, 128), jnp.float32)
    ms = timed_ms(lambda x: x + 1.0, tiny, iters=20)
    print(f"call+readback overhead (tiny op):        {ms:7.2f} ms")

    # MXU peak: big bf16 matmul
    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            )

        ms = timed_ms(mm, a, b, iters=10)
        tf = 2 * n**3 / (ms * 1e-3) / 1e12
        print(f"bf16 matmul {n}x{n}x{n}:              {ms:7.2f} ms  {tf:6.1f} TFLOP/s")

    # HBM stream: elementwise over a big buffer (read + write)
    for mb, shape in ((482, (942080, 256)), (64, (131072, 256))):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        ms = timed_ms(lambda x: x * 1.0009 + 1.0, x, iters=10)
        gbps = 2 * x.size * 2 / (ms * 1e-3) / 1e9
        print(f"elementwise stream {mb} MB bf16:      {ms:7.2f} ms  {gbps:6.1f} GB/s")

    # f32 matmul for reference (HIGHEST-free default)
    n = 4096
    a = jax.random.normal(key, (n, n), jnp.float32)
    b = jax.random.normal(key, (n, n), jnp.float32)
    ms = timed_ms(lambda a, b: jnp.dot(a, b), a, b, iters=10)
    tf = 2 * n**3 / (ms * 1e-3) / 1e12
    print(f"f32 matmul {n}:                        {ms:7.2f} ms  {tf:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
