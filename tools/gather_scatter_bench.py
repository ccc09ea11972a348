"""Layout scan for gather (warp) and scatter-add (softsplat) on TPU.

XLA TPU gathers/scatters have wildly different lowerings depending on which
axis is indexed and the operand layout; this finds the fast path before any
Pallas work. Timing via fori_loop + scalar readback (see microbench.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_op(op, args, iters=4, name=""):
    def looped(*args):
        def body(_, carry):
            perturbed = [
                a + (carry * 1e-24).astype(a.dtype)
                if a.dtype.kind == "f"
                else a
                for a in args
            ]
            return op(*perturbed).mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fn = jax.jit(looped)
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:60s} {ms:9.2f} ms")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    H, W, C = 736, 1280, 17
    P = H * W
    img = jax.random.normal(key, (1, P, C), jnp.float32)
    idxf = jax.random.uniform(key, (1, P), minval=0, maxval=P - 1)

    # ---------------- gather variants (indices data-dependent via perturb)
    def g1(img, idxf):
        idx = idxf.astype(jnp.int32)
        return jnp.take_along_axis(img, idx[..., None], axis=1)

    time_op(g1, (img, idxf), name="gather axis1 (1,P,17) [current warp path]")

    imgT = jnp.transpose(img, (0, 2, 1))  # (1, C, P)

    def g2(imgT, idxf):
        idx = idxf.astype(jnp.int32)
        return jnp.take_along_axis(
            imgT, jnp.broadcast_to(idx[:, None, :], imgT.shape), axis=2
        )

    time_op(g2, (imgT, idxf), name="gather last-axis (1,C,P) broadcast idx")

    img2d = img[0]  # (P, C)

    def g3(img2d, idxf):
        idx = idxf[0].astype(jnp.int32)
        return jnp.take(img2d, idx, axis=0)

    time_op(g3, (img2d, idxf), name="jnp.take axis0 (P,17)")

    def g3c(img2d, idxf):
        idx = idxf[0].astype(jnp.int32)
        return img2d[idx]

    time_op(g3c, (img2d, idxf), name="adv-index rows (P,17)")

    img128 = jax.random.normal(key, (P, 128), jnp.float32)

    def g4(img128, idxf):
        idx = idxf[0].astype(jnp.int32)
        return jnp.take(img128, idx, axis=0)

    time_op(g4, (img128, idxf), name="jnp.take axis0 (P,128) [wide rows]")

    # one-hot-free: 4-corner fused vs single gather cost reference
    def g5(img2d, idxf):
        idx = idxf[0].astype(jnp.int32)
        a = jnp.take(img2d, idx, axis=0)
        b = jnp.take(img2d, jnp.minimum(idx + 1, P - 1), axis=0)
        c = jnp.take(img2d, jnp.minimum(idx + W, P - 1), axis=0)
        d = jnp.take(img2d, jnp.minimum(idx + W + 1, P - 1), axis=0)
        return a * 0.25 + b * 0.25 + c * 0.25 + d * 0.25

    time_op(g5, (img2d, idxf), name="4-corner gathers (P,17)")

    # ---------------- scatter variants
    upd = jax.random.normal(key, (1, P, C), jnp.float32)

    def s1(upd, idxf):
        idx = idxf.astype(jnp.int32)
        out = jnp.zeros((1, P, C), jnp.float32)
        return out.at[jnp.arange(1)[:, None], idx].add(upd, mode="drop")

    time_op(s1, (upd, idxf), name="scatter axis1 (1,P,17) [current splat path]")

    def s2(upd, idxf):
        idx = idxf[0].astype(jnp.int32)
        out = jnp.zeros((P, C), jnp.float32)
        return out.at[idx].add(upd[0], mode="drop")

    time_op(s2, (upd, idxf), name="scatter rows (P,17) flat")

    updT = jnp.transpose(upd, (0, 2, 1))

    def s3(updT, idxf):
        idx = idxf.astype(jnp.int32)
        out = jnp.zeros((1, C, P), jnp.float32)
        return out.at[:, :, idx[0]].add(updT, mode="drop")

    time_op(s3, (updT, idxf), name="scatter last-axis (1,C,P)")

    def s4(upd, idxf):
        idx = idxf[0].astype(jnp.int32)
        out = jnp.zeros((P, C), jnp.bfloat16)
        return out.at[idx].add(upd[0].astype(jnp.bfloat16), mode="drop")

    time_op(s4, (upd, idxf), name="scatter rows (P,17) bf16")

    upd1 = jax.random.normal(key, (P,), jnp.float32)

    def s5(upd1, idxf):
        idx = idxf[0].astype(jnp.int32)
        out = jnp.zeros((P,), jnp.float32)
        return out.at[idx].add(upd1, mode="drop")

    time_op(s5, (upd1, idxf), name="scatter scalar rows (P,) 1ch")

    # sort-based alternative building blocks
    def srt(idxf):
        idx = idxf[0].astype(jnp.int32)
        return jnp.sort(idx).astype(jnp.float32)

    time_op(srt, (idxf,), name="sort P int32 keys")

    def asrt(idxf):
        idx = idxf[0].astype(jnp.int32)
        return jnp.argsort(idx).astype(jnp.float32)

    time_op(asrt, (idxf,), name="argsort P int32 keys")

    def csum(upd):
        return jnp.cumsum(upd[0], axis=0)

    time_op(csum, (upd,), name="cumsum (P,17)")


if __name__ == "__main__":
    main()
