"""Marginal-cost probe: chain K copies of an op inside ONE dispatch.

(cost(K2) - cost(K1)) / (K2 - K1) isolates the true per-op device time from
the ~4 ms dispatch+readback overhead of the axon tunnel, giving honest HBM
and conv throughput numbers to design kernels against.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_ms(fn, *args, iters=5):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def chain(op, k):
    def fn(x):
        y = x
        for _ in range(k):
            y = op(y)
        return y

    return fn


def main():
    key = jax.random.PRNGKey(0)

    # elementwise stream, 482 MB bf16 (the full-res 256-ch activation)
    x = jax.random.normal(key, (942080, 256), jnp.bfloat16)

    def ew(y):
        return y * 1.0009 + 0.001

    t2 = timed_ms(chain(ew, 2), x)
    t10 = timed_ms(chain(ew, 10), x)
    per = (t10 - t2) / 8
    gbps = 2 * x.size * 2 / (per * 1e-3) / 1e9
    print(f"elementwise 482MB marginal: {per:6.2f} ms/pass  {gbps:6.1f} GB/s")

    # conv 3x3 256->256 bf16 at 736x1280, marginal
    xc = jax.random.normal(key, (1, 736, 1280, 256), jnp.bfloat16)
    k33 = jax.random.normal(key, (3, 3, 256, 256), jnp.bfloat16) * 0.01

    def conv(y):
        return jax.lax.conv_general_dilated(
            y, k33, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t1 = timed_ms(chain(conv, 1), xc, iters=3)
    t5 = timed_ms(chain(conv, 5), xc, iters=3)
    per = (t5 - t1) / 4
    fl = 736 * 1280 * 256 * 256 * 9 * 2
    print(f"conv3x3 256ch marginal:     {per:6.2f} ms/conv  {fl/per/1e9:6.1f} TFLOP/s")

    # PReLU marginal at 256ch full res
    def prelu(y):
        a = jnp.full((256,), 0.25, jnp.bfloat16)
        return jnp.maximum(y, 0) + a * jnp.minimum(y, 0)

    t2 = timed_ms(chain(prelu, 2), x)
    t10 = timed_ms(chain(prelu, 10), x)
    per = (t10 - t2) / 8
    gbps = 2 * x.size * 2 / (per * 1e-3) / 1e9
    print(f"PReLU 482MB marginal:       {per:6.2f} ms/pass  {gbps:6.1f} GB/s")

    # conv+PReLU chained (does XLA fuse the activation into the conv?)
    def convp(y):
        return prelu(conv(y))

    t1 = timed_ms(chain(convp, 1), xc, iters=3)
    t5 = timed_ms(chain(convp, 5), xc, iters=3)
    per = (t5 - t1) / 4
    print(f"conv+PReLU marginal:        {per:6.2f} ms/conv  {fl/per/1e9:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
