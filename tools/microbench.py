"""TPU primitive microbenchmarks for the GIMM-VFI hot path.

Times the exact primitive shapes the 736x1280 8x pipeline uses, so the
optimization order is driven by measurement instead of FLOP guesses.

Measurement notes (hard-won on the axon tunnel):
  * `jax.block_until_ready` does NOT wait for remote execution — only a
    scalar readback (float()) forces completion.
  * Ops are timed inside ONE jit via `lax.fori_loop` whose carry perturbs
    the inputs (1e-24 * carry) and consumes the output (mean), so XLA can
    neither hoist the op out of the loop nor DCE it, and iterations are
    serialized.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_op(op, args, iters=8, name="", flops=None):
    """op(*args) -> array; returns ms/iter, forcing real serialization."""

    def looped(*args):
        def body(_, carry):
            perturbed = [
                a + (carry * 1e-24).astype(a.dtype) if a.dtype.kind == "f" else a
                for a in args
            ]
            out = op(*perturbed)
            return out.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fn = jax.jit(looped)
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))  # scalar readback = real completion
    ms = (time.perf_counter() - t0) / iters * 1e3
    extra = ""
    if flops:
        extra = f"  ({flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s)"
    print(f"{name:55s} {ms:9.2f} ms{extra}")
    return ms


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    H, W = 736, 1280
    P = H * W

    from gimmvfi_tpu.ops.interp import resize, warp
    from gimmvfi_tpu.ops.softsplat import softsplat
    from gimmvfi_tpu.ops import corr as corr_ops

    # ---- softsplat scatter-add: the GIMM latent splat (per timestep)
    vals = jax.random.normal(key, (1, H, W, 16), jnp.float32)
    flow = 20.0 * jax.random.normal(key, (1, H, W, 2), jnp.float32)
    metric = jax.random.uniform(key, (1, H, W, 1), jnp.float32)
    time_op(lambda v, f, m: softsplat(v, f, m, "linear-zeroeps"),
            (vals, flow, metric), name="softsplat linear-zeroeps (1,736,1280,16)")

    # ---- warp gather at full res: 6+2 of these per timestep in synthesis
    img = jax.random.uniform(key, (3, H, W, 3), jnp.float32)
    flow3 = 20.0 * jax.random.normal(key, (3, H, W, 2), jnp.float32)
    time_op(warp, (img, flow3), name="warp gather (3,736,1280,3)")

    img64 = jax.random.uniform(key, (1, H, W, 64), jnp.float32)
    flow1 = 20.0 * jax.random.normal(key, (1, H, W, 2), jnp.float32)
    time_op(warp, (img64, flow1), name="warp gather (1,736,1280,64) [decoder feats]")

    # ---- all-pairs corr at RAFT 1/8 scale
    h8, w8 = H // 8, W // 8
    fm1 = jax.random.normal(key, (2, h8, w8, 256), jnp.float32)
    fm2 = jax.random.normal(key, (2, h8, w8, 256), jnp.float32)
    corr_flops = 2 * 2 * (h8 * w8) ** 2 * 256

    def corr(a, b, prec):
        n, h, w, c = a.shape
        return jnp.einsum(
            "npc,nqc->npq",
            a.reshape(n, h * w, c),
            b.reshape(n, h * w, c),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    time_op(lambda a, b: corr(a, b, jax.lax.Precision.HIGHEST), (fm1, fm2),
            iters=4, name="all-pairs corr (2,14720,256) HIGHEST", flops=corr_flops)
    time_op(lambda a, b: corr(a, b, jax.lax.Precision.DEFAULT), (fm1, fm2),
            iters=4, name="all-pairs corr DEFAULT", flops=corr_flops)
    time_op(lambda a, b: corr(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                              jax.lax.Precision.DEFAULT), (fm1, fm2),
            iters=4, name="all-pairs corr bf16 in", flops=corr_flops)

    # ---- corr window lookup (4-level pyramid) at RAFT scale, batch 2
    pyr = jax.jit(lambda a, b: corr_ops.corr_pyramid(a, b).levels)(fm1, fm2)
    coords = (
        jnp.stack(
            jnp.meshgrid(
                jnp.arange(w8, dtype=jnp.float32),
                jnp.arange(h8, dtype=jnp.float32),
            ),
            -1,
        )[None].repeat(2, 0)
        + 3.7
    )
    time_op(
        lambda c, *p: corr_ops.corr_lookup(corr_ops.CorrPyramid(tuple(p)), c),
        (coords, *pyr), name="corr_lookup r=4 x4 levels (2,92,160) f32",
    )
    pyr16 = tuple(p.astype(jnp.bfloat16) for p in pyr)
    time_op(
        lambda c, *p: corr_ops.corr_lookup(corr_ops.CorrPyramid(tuple(p)), c),
        (coords, *pyr16), name="corr_lookup r=4 x4 levels (2,92,160) bf16",
    )

    # ---- representative synthesis conv: 256->256 3x3 at FULL res
    kf = jax.random.normal(key, (3, 3, 256, 256), jnp.float32) * 0.02
    x256 = jax.random.normal(key, (1, H, W, 256), jnp.float32)
    conv_flops = 2 * H * W * 256 * 256 * 9

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    time_op(conv, (x256, kf), iters=4,
            name="conv 3x3 256ch @736x1280 f32", flops=conv_flops)
    time_op(lambda x, k: conv(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)),
            (x256, kf), iters=4,
            name="conv 3x3 256ch @736x1280 bf16", flops=conv_flops)

    # ---- HypoNet matmul chain at full-res coordinate count
    hidden = jax.random.normal(key, (1, P, 36), jnp.float32)
    ws = [jax.random.normal(key, (36, 128), jnp.float32)] + [
        jax.random.normal(key, (128, 128), jnp.float32) for _ in range(3)
    ] + [jax.random.normal(key, (128, 2), jnp.float32)]
    hypo_flops = 2 * P * (36 * 128 + 3 * 128 * 128 + 128 * 2)

    def hypo(h, *ws):
        for w_ in ws:
            h = jnp.sin(jnp.einsum("bpd,df->bpf", h, w_,
                                   preferred_element_type=jnp.float32))
        return h

    time_op(hypo, (hidden, *ws), name="hyponet chain 941k coords DEFAULT",
            flops=hypo_flops)

    def hypo_bf16(h, *ws):
        for w_ in ws:
            h = jnp.sin(jnp.einsum("bpd,df->bpf", h.astype(jnp.bfloat16),
                                   w_.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32))
        return h

    time_op(hypo_bf16, (hidden, *ws), name="hyponet chain 941k coords bf16",
            flops=hypo_flops)

    # ---- resize (separable bilinear) to full res
    x64s = jax.random.normal(key, (1, H // 4, W // 4, 64), jnp.float32)
    time_op(lambda x: resize(x, 4.0), (x64s,), name="resize 4x (1,184,320,64)->full")

    # ---- grand totals context: one 720p decode_one is ~13 convs + 8 warps +
    # 1 splat + 1 hyponet + ~6 resizes; prepare is RAFT (2x20 GRU iters).


if __name__ == "__main__":
    main()
