"""Benchmark: GIMM-VFI-R 8x interpolation throughput at 720p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): interpolated frames/sec for 8x arbitrary-t
interpolation of a 720p pair. The reference repo publishes no V100 fps, so
vs_baseline uses a documented estimate of the PyTorch reference on V100
(~4 interpolated fps at 720p 8x: ~1.8 s/pair for RAFT x2 @20 iters + 7 INR
decodes + 7 synthesis passes); target is >=3x (BASELINE.json).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

V100_REFERENCE_FPS_720P_8X = 4.0  # estimate, pending reference measurement


def _fetch(out):
    """Force completion: on the axon tunnel block_until_ready returns before
    remote execution finishes — only a host readback truly waits."""
    return float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).mean())


def _time(fn, *args, iters=3):
    _fetch(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def profile_stages(model, variables, img_xs, n_t):
    """Per-stage timings: where do the milliseconds go? Run with --profile."""
    from gimmvfi_tpu.flow.raft import RAFT

    prep_fn = jax.jit(
        lambda v, x: model.apply(v, x, None, method=model.prepare)
    )
    prep = prep_fn(variables, img_xs)
    t_prep = _time(prep_fn, variables, img_xs)
    print(f"prepare (2x RAFT + corr pyramids + latents): {t_prep*1e3:.1f} ms")

    dec_fn = jax.jit(
        lambda v, p, t: model.apply(v, p, t, method=model.decode_one)["imgt_pred"]
    )
    t_dec = _time(dec_fn, variables, prep, jnp.float32(0.5))
    print(f"decode_one (splat + INR + AMT synthesis):    {t_dec*1e3:.1f} ms")

    raft = RAFT(iters=model.raft_iters, dtype=model.dtype)
    rv = {"params": variables["params"]["flow_estimator"]}
    rs = variables.get("batch_stats", {}).get("flow_estimator")
    if rs is not None:
        rv["batch_stats"] = rs
    raft_fn = jax.jit(lambda v, a, b: raft.apply(v, a, b)[0])
    t_raft = _time(raft_fn, rv, 255 * img_xs[:, 0], 255 * img_xs[:, 1])
    print(f"single RAFT ({model.raft_iters} iters):      {t_raft*1e3:.1f} ms")

    total = t_prep + n_t * t_dec
    print(f"=> modeled total for {n_t} frames: {total*1e3:.1f} ms "
          f"({n_t/total:.3f} fps)")


def main():
    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R, interpolate_sequential

    p = argparse.ArgumentParser()
    p.add_argument("--profile", action="store_true", help="per-stage timings")
    p.add_argument("--trace-dir", default=None, help="jax.profiler trace output")
    p.add_argument("--size", default="736x1280")
    p.add_argument(
        "--ds", type=float, default=None,
        help="DS_SCALE working-res factor (e.g. 0.5 for the 2K envelope: "
        "--size 2048x1088 --ds 0.5, reference README.md:93-95)",
    )
    p.add_argument(
        "--f32", action="store_true",
        help="full-f32 compute (default: bf16 mixed precision, the "
        "production inference configuration; f32-vs-bf16 agree >70 dB)",
    )
    args = p.parse_args()

    n_t = 7  # 8x => 7 intermediate frames
    h, w = (int(s) for s in args.size.split("x"))  # 720p padded to /32
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = GIMMVFI_R(raft_iters=20, dtype=dtype)

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
        out = interpolate_sequential(model, variables, img_xs, ts, args.ds)
        return out["imgt_pred"]

    img_xs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, h, w, 3))

    if args.profile:
        profile_stages(model, variables, img_xs, n_t)

    # warmup/compile
    _fetch(run(variables, img_xs))

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            _fetch(run(variables, img_xs))

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch(run(variables, img_xs))
    dt = (time.perf_counter() - t0) / iters

    fps = n_t / dt
    print(
        json.dumps(
            {
                "metric": "interp_frames_per_sec_720p_8x",
                "value": round(fps, 3),
                "unit": "frames/sec",
                # baseline is a documented ESTIMATE of the torch reference on
                # V100 (no published fps exists); see module docstring
                "vs_baseline": round(fps / V100_REFERENCE_FPS_720P_8X, 3),
                "baseline_is_estimate": True,
            }
        )
    )


if __name__ == "__main__":
    main()
