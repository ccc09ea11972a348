"""Exponential moving average over parameter pytrees.

Rebuilds `src/models/ema.py`: the reference EMAs the *full state dict*
(params + BN running stats) with mu = min(mu_cap, (1+step)/(10+step)) when the
config passes `ema: true` (bool -> scheduled), or a fixed mu otherwise;
step < 0 copies (`ema.py:27-50`). Here it's a pure tree op over
`{"params": ..., "batch_stats": ...}` variable collections.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(variables: Any) -> Any:
    """Initial EMA state = copy of the model variables (step -1 behavior).

    A REAL copy: `jnp.asarray` would alias the source buffers, and aliased
    params/ema leaves break buffer donation ("donate the same buffer twice")
    on the first donated train step."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)


def ema_update(
    ema_vars: Any,
    new_vars: Any,
    step: jax.Array | int,
    mu_cap: float = 1.0,
    scheduled: bool = True,
) -> Any:
    """One EMA step. jit-friendly (step may be traced)."""
    if scheduled:
        step = jnp.asarray(step, jnp.float32)
        mu = jnp.minimum(mu_cap, (1.0 + step) / (10.0 + step))
    else:
        mu = jnp.asarray(mu_cap, jnp.float32)
    return jax.tree_util.tree_map(
        lambda e, p: mu * e + (1.0 - mu) * p, ema_vars, new_vars
    )
