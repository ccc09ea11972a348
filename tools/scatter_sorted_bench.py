"""Can sorting make TPU scatter-add fast? Decides the softsplat redesign.

Compares: 4 separate corner scatters (current), one combined 4P scatter,
scatter with pre-sorted indices (claimed and unclaimed), and the full
sort->gather->sorted-scatter pipeline at softsplat's real shapes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_op(op, args, iters=4, name=""):
    def looped(*args):
        def body(_, carry):
            perturbed = [
                a + (carry * 1e-24).astype(a.dtype) if a.dtype.kind == "f" else a
                for a in args
            ]
            return op(*perturbed).mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fn = jax.jit(looped)
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:62s} {ms:9.2f} ms")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    H, W, C = 736, 1280, 17
    P = H * W
    upd = jax.random.normal(key, (P, C), jnp.float32)
    idxf = jax.random.uniform(key, (P,), minval=0, maxval=P - 1)

    def four_scatters(upd, idxf):
        idx = idxf.astype(jnp.int32)
        out = jnp.zeros((P, C), jnp.float32)
        for d in (0, 1, W, W + 1):
            out = out.at[jnp.minimum(idx + d, P - 1)].add(upd, mode="drop")
        return out

    time_op(four_scatters, (upd, idxf), name="4 corner scatters (P,17) [current]")

    def combined(upd, idxf):
        idx = idxf.astype(jnp.int32)
        idx4 = jnp.concatenate(
            [jnp.minimum(idx + d, P - 1) for d in (0, 1, W, W + 1)]
        )
        upd4 = jnp.tile(upd, (4, 1))
        out = jnp.zeros((P, C), jnp.float32)
        return out.at[idx4].add(upd4, mode="drop")

    time_op(combined, (upd, idxf), name="one combined 4P-row scatter")

    # scatter with indices pre-sorted on the host side of the graph
    idx_sorted = jnp.sort(idxf.astype(jnp.int32))

    def plain_on_sorted(upd, idx_sorted):
        out = jnp.zeros((P, C), jnp.float32)
        return out.at[idx_sorted].add(upd, mode="drop")

    time_op(plain_on_sorted, (upd, idx_sorted),
            name="scatter (P,17), indices sorted, unclaimed")

    def claimed_sorted(upd, idx_sorted):
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,),
        )
        out = jnp.zeros((P, C), jnp.float32)
        return jax.lax.scatter_add(
            out, idx_sorted[:, None], upd, dnums,
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )

    time_op(claimed_sorted, (upd, idx_sorted),
            name="scatter (P,17), indices_are_sorted=True")

    # the full exact pipeline: argsort keys -> permute payload -> sorted scatter
    def full_pipeline(upd, idxf):
        idx = idxf.astype(jnp.int32)
        order = jnp.argsort(idx)
        idx_s = jnp.take(idx, order)
        upd_s = jnp.take(upd, order, axis=0)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,),
        )
        out = jnp.zeros((P, C), jnp.float32)
        return jax.lax.scatter_add(
            out, idx_s[:, None], upd_s, dnums,
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )

    time_op(full_pipeline, (upd, idxf),
            name="argsort + permute + sorted scatter (P,17)")

    # segment_sum on sorted segment ids (same lowering? sanity check)
    def segsum(upd, idx_sorted):
        return jax.ops.segment_sum(
            upd, idx_sorted, num_segments=P, indices_are_sorted=True
        )

    time_op(segsum, (upd, idx_sorted), name="segment_sum sorted (P,17)")


if __name__ == "__main__":
    main()
