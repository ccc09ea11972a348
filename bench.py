"""Benchmark: GIMM-VFI-R 8x interpolation throughput at 720p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): interpolated frames/sec for 8x arbitrary-t
interpolation of a 720p pair. The reference repo publishes no V100 fps, so
vs_baseline uses a documented estimate of the PyTorch reference on V100
(~4 interpolated fps at 720p 8x: ~1.8 s/pair for RAFT x2 @20 iters + 7 INR
decodes + 7 synthesis passes); target is >=3x (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

V100_REFERENCE_FPS_720P_8X = 4.0  # estimate, pending reference measurement


def main():
    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R, interpolate_sequential

    n_t = 7  # 8x => 7 intermediate frames
    h, w = 736, 1280  # 720p padded to /32
    model = GIMMVFI_R(raft_iters=20)

    # init via eval_shape: eager init on the TPU tunnel is pathologically slow
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    var_shapes = jax.eval_shape(lambda r, x: model.init(r, x, (0.5,)), rng, small)
    key = jax.random.PRNGKey(2)
    variables = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, jnp.float32) * 0.02).astype(s.dtype)
        if s.dtype == jnp.float32
        else jnp.zeros(s.shape, s.dtype),
        var_shapes,
    )

    ts = jnp.asarray([(i + 1) / (n_t + 1) for i in range(n_t)], jnp.float32)

    @jax.jit
    def run(variables, img_xs):
        # sequential per-timestep decode: one timestep's synthesis live at a
        # time (lax.scan), flow estimation shared across all timesteps
        out = interpolate_sequential(model, variables, img_xs, ts)
        return out["imgt_pred"]

    img_xs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, h, w, 3))

    # warmup/compile
    jax.block_until_ready(run(variables, img_xs))

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(run(variables, img_xs))
    dt = (time.perf_counter() - t0) / iters

    fps = n_t / dt
    print(
        json.dumps(
            {
                "metric": "interp_frames_per_sec_720p_8x",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / V100_REFERENCE_FPS_720P_8X, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
