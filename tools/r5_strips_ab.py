"""A/B the MultiFlowDecoder full-res stack: strips on/off, remat on/off (TPU).

Round-3 measured strips ~1.6x faster; peak_probe3 (round 5) measures plain
batch-1 conv at 99.3 TFLOP/s vs 62 for tiled — the compiler changed. Also
checks whether the decoder-level nn.remat wrapper (setup'd for the training
path) costs anything in forward-only inference: synth_profile measured the
remat-wrapped decoder at 186.6 ms vs 134.5 ms raw here.
"""

from __future__ import annotations

import time

import flax.linen as nn
import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.synthesis import MultiFlowDecoder
from gimmvfi_tpu.ops import strips


def timed(fn, *args, iters=4, name=""):
    f = jax.jit(fn)
    float(jnp.asarray(jax.tree_util.tree_leaves(f(*args))[0]).mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {ms:8.1f} ms")
    return ms


def _inputs():
    h, w = 736, 1280
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    return (
        jax.random.normal(key, (1, h // 4, w // 4, 128), dt),  # ft4
        jax.random.normal(key, (1, h, w, 64), dt),  # f0 (pre-upsampled)
        jax.random.normal(key, (1, h, w, 64), dt),  # f1
        jax.random.normal(key, (1, h // 4, w // 4, 2), jnp.float32) * 4,
        jax.random.normal(key, (1, h // 4, w // 4, 2), jnp.float32) * 4,
        jax.random.normal(key, (1, h // 4, w // 4, 1), jnp.float32),  # mask
        jax.random.uniform(key, (1, h, w, 3)),  # img0
        jax.random.uniform(key, (1, h, w, 3)),  # img1
    )


def bench_decoder(dec, label):
    args = _inputs()
    variables = dec.init(jax.random.PRNGKey(1), *args, False, False)

    def run(v):
        return dec.apply(v, *args, False, False)[0]

    return timed(run, variables, name=label)


def main():
    dt = jnp.bfloat16
    raw = MultiFlowDecoder(128, 64, 3, dtype=dt)
    for label, enabled in (("strips ON", True), ("strips OFF", False)):
        strips.ENABLED = enabled
        bench_decoder(raw, f"MultiFlowDecoder raw, {label}")

    strips.ENABLED = True
    rem_cls = nn.remat(MultiFlowDecoder, static_argnums=(9, 10))
    bench_decoder(
        rem_cls(128, 64, 3, dtype=dt),
        "MultiFlowDecoder nn.remat-wrapped (as in the model)",
    )


if __name__ == "__main__":
    main()
