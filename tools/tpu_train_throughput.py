"""Measured training throughput ON THE TPU at the reference recipe shapes.

Runs BOTH stages for real (fabricated data, the shapes of the released
recipes) and records steps/sec, a short loss curve, and peak HBM into
TRAIN_TPU.json at the repo root:

  stage 1 (GIMM motion pretraining):  256x256 flows, batch 32
      (`configs/gimm/gimm.yaml:38-57` — 32/GPU x 2 GPUs in the reference;
      one v5e chip takes the full per-host 32 here)
  stage 2 (GIMM-VFI-R fine-tune):     224x224 frames, batch 4, ft groups
      (`configs/gimmvfi/gimmvfi_r_arb.yaml:35-54`)

Run: PYTHONPATH=/root/repo python tools/tpu_train_throughput.py [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gimmvfi_tpu.models.gimm import GIMM
from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
from gimmvfi_tpu.train.optim import create_optimizer
from gimmvfi_tpu.train.train_state import (
    create_train_state,
    make_gimm_train_step,
    make_gimmvfi_train_step,
)


def _random_variables(model, init_args, scale=0.02):
    rng = jax.random.PRNGKey(0)
    var_shapes = jax.eval_shape(lambda r: model.init(r, *init_args), rng)
    key = jax.random.PRNGKey(2)
    variables = dict(
        jax.tree_util.tree_map(
            lambda s: (jax.random.normal(key, s.shape, jnp.float32) * scale).astype(
                s.dtype
            )
            if s.dtype == jnp.float32
            else jnp.zeros(s.shape, s.dtype),
            var_shapes,
        )
    )
    variables.setdefault("batch_stats", {})
    return variables


def _peak_hbm_mib():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["peak_bytes_in_use"] / (1 << 20))
    except Exception:
        return None


def _loss_points(losses, k=5):
    """k evenly-spaced (step, loss) points of the curve for the record."""
    idx = np.linspace(0, len(losses) - 1, k).astype(int)
    return [[int(i), round(float(losses[i]), 5)] for i in idx]


def run_stage1(steps: int):
    b, h, w = 32, 256, 256
    model = GIMM(remat=True)
    rng_np = np.random.default_rng(0)
    xs = jnp.asarray(rng_np.random((b, 3, h, w, 2)), jnp.float32)
    ori = jnp.asarray(rng_np.normal(0, 3, (b, 2, h, w, 2)), jnp.float32)
    variables = _random_variables(
        model, (xs[:, [0, 2]], ori, jnp.full((b,), 0.5, jnp.float32))
    )

    tx = create_optimizer(variables["params"], ft=False, init_lr=1e-4)
    state = create_train_state(variables, tx, use_ema=True)
    step_fn = jax.jit(make_gimm_train_step(model, tx, use_ema=True),
                      donate_argnums=(0,))

    # keep per-step metrics on device; one readback at the end (the axon
    # tunnel's per-call latency would otherwise pollute steps/sec)
    losses = []
    t_ids = rng_np.integers(0, 3, size=steps)
    t_compile = time.perf_counter()
    for i in range(steps):
        # one shared t_id per iteration (`trainer_gimm.py:125-132`)
        batch = {
            "xs": xs,
            "ori_flows": ori,
            "t_id": jnp.full((b,), int(t_ids[i]), jnp.int32),
        }
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss_total"])
        if i == 0:
            float(losses[0])
            compile_s = time.perf_counter() - t_compile
            t_loop = time.perf_counter()
    losses = [float(l) for l in losses]
    steps_per_sec = (steps - 1) / (time.perf_counter() - t_loop)
    return {
        "stage": 1,
        "shape": f"bs{b} {h}x{w}",
        "steps": steps,
        "compile_s": round(compile_s, 1),
        "steps_per_sec": round(steps_per_sec, 3),
        "loss_curve": _loss_points(losses),
        "loss_decreased": bool(losses[-1] < losses[0]),
        "peak_hbm_mib": _peak_hbm_mib(),
    }


def run_stage2(steps: int):
    b, h, w = 4, 224, 224
    model = GIMMVFI_R(raft_iters=20)
    variables = _random_variables(
        model, (jnp.zeros((1, 2, 64, 64, 3), jnp.float32), (0.5,))
    )

    tx = create_optimizer(variables["params"], ft=True, init_lr=8e-5)
    state = create_train_state(variables, tx, use_ema=True)
    step_fn = jax.jit(make_gimmvfi_train_step(model, tx), donate_argnums=(0,))

    rng_np = np.random.default_rng(0)
    k = int(h * w * 0.1)
    img0 = jnp.asarray(rng_np.random((b, h, w, 3)), jnp.float32)
    img1 = jnp.asarray(rng_np.random((b, h, w, 3)), jnp.float32)
    batch = {
        "img0": img0,
        "img1": img1,
        "gt": 0.5 * (img0 + img1),
        "t": jnp.full((b,), 0.5, jnp.float32),
        "sub_idx0": jnp.asarray(
            np.stack([rng_np.permutation(h * w)[:k] for _ in range(b)]), jnp.int32
        ),
        "sub_idx1": jnp.asarray(
            np.stack([rng_np.permutation(h * w)[:k] for _ in range(b)]), jnp.int32
        ),
    }

    losses = []
    t_compile = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss_total"])
        if i == 0:
            float(losses[0])
            compile_s = time.perf_counter() - t_compile
            t_loop = time.perf_counter()
    losses = [float(l) for l in losses]
    steps_per_sec = (steps - 1) / (time.perf_counter() - t_loop)
    return {
        "stage": 2,
        "shape": f"bs{b} {h}x{w}",
        "steps": steps,
        "compile_s": round(compile_s, 1),
        "steps_per_sec": round(steps_per_sec, 3),
        "loss_curve": _loss_points(losses),
        "loss_decreased": bool(losses[-1] < losses[0]),
        "peak_hbm_mib": _peak_hbm_mib(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    print("devices:", jax.devices())
    record = {"device": str(jax.devices()[0])}
    record["stage1"] = run_stage1(args.steps)
    print("stage1:", json.dumps(record["stage1"]))
    record["stage2"] = run_stage2(args.steps)
    print("stage2:", json.dumps(record["stage2"]))

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_TPU.json",
    )
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
