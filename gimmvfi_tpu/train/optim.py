"""Optimizers + LR schedules (optax).

Rebuilds `src/optimizer/optimizer.py` + `scheduler.py`:

  * fine-tune param groups: parameters whose path contains "amt_" train at
    full lr/weight-decay, everything else (GIMM + flow estimator) at 0.01x
    (`optimizer.py:19-45`) — implemented as optax.multi_transform over a
    label tree.
  * GradualWarmup (linear, world-size-scaled multiplier) into
    CosineAnnealingLR to min_lr, stepped per iteration
    (`scheduler.py:16-122`, `trainer_gimmvfi.py:335`).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    init_lr: float,
    min_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    buffer_steps: int = 0,
    multiplier: float = 1.0,
    mode: str = "fix",
    world_size: int = 1,
    start_from_zero: bool = True,
):
    """Reference warmup->cosine composition as an optax schedule fn."""
    if mode == "linear":
        multiplier = max(1.0, multiplier * world_size)
    elif mode == "sqrt":
        multiplier = max(1.0, multiplier * math.sqrt(world_size))
    elif mode == "fix":
        multiplier = max(1.0, multiplier)

    cosine_steps = max(1, total_steps - warmup_steps - buffer_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def warm(s):
            frac = jnp.minimum(1.0, s / max(1, warmup_steps))
            if start_from_zero:
                return init_lr * multiplier * frac
            return init_lr * (1.0 + (multiplier - 1.0) * frac)

        def cos(s):
            t = jnp.clip(s - warmup_steps - buffer_steps, 0.0, cosine_steps)
            return min_lr + 0.5 * (init_lr - min_lr) * (
                1.0 + jnp.cos(jnp.pi * t / cosine_steps)
            )

        if warmup_steps == 0:
            return cos(step)
        return jnp.where(step <= warmup_steps, warm(step), cos(step))

    return schedule


def _amt_label_tree(params: Any) -> Any:
    """Label each leaf 'amt' or 'rest' by whether its path enters an amt_*
    module (`optimizer.py:19-36`)."""

    def label(path, _leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "amt" if any(str(n).startswith("amt_") for n in names) else "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def _base_tx(opt_type: str, lr_fn, weight_decay: float, betas, scale: float = 1.0):
    def scaled_lr(step):
        return lr_fn(step) * scale

    if opt_type == "adamw":
        return optax.adamw(
            learning_rate=scaled_lr,
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay * scale,
        )
    if opt_type == "adam":
        # torch Adam applies weight_decay as L2 into the gradient
        tx = optax.adam(learning_rate=scaled_lr, b1=betas[0], b2=betas[1], eps=1e-8)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay * scale), tx)
        return tx
    if opt_type == "sgd":
        tx = optax.sgd(learning_rate=scaled_lr, momentum=0.9)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay * scale), tx)
        return tx
    raise ValueError(f"unknown optimizer type: {opt_type}")


def create_optimizer(
    params: Any,
    opt_type: str = "adamw",
    init_lr: float = 8e-5,
    weight_decay: float = 4e-5,
    betas: tuple[float, float] = (0.9, 0.999),
    ft: bool = True,
    lr_schedule=None,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the (optionally two-group) optimizer.

    `lr_schedule` is a step->lr fn (defaults to constant init_lr); with
    `ft=True` non-amt parameters get 0.01x lr and weight decay.
    """
    lr_fn = lr_schedule if lr_schedule is not None else (lambda s: init_lr)

    if ft:
        tx = optax.multi_transform(
            {
                "amt": _base_tx(opt_type, lr_fn, weight_decay, betas, 1.0),
                "rest": _base_tx(opt_type, lr_fn, weight_decay, betas, 0.01),
            },
            _amt_label_tree(params),
        )
    else:
        tx = _base_tx(opt_type, lr_fn, weight_decay, betas, 1.0)

    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
