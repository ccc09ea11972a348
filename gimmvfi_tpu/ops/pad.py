"""Input padding utilities (divisor padding for the flow/synthesis pyramid).

Reference: `raft/utils/utils.py:7-30` (divisor-8, "sintel" mode splits the
pad between both sides) and `src/utils/utils.py:156-185` (divisor-32 variant
used by every inference entry point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class InputPadder:
    """Pads NHWC images so H and W are divisible by `divisor` (replicate).

    `bucket` > divisor rounds the padded size up to a multiple of `bucket`
    instead: shape-bucketing so mixed-size eval sets hit one XLA compile per
    bucket instead of one per distinct frame size (recompile hygiene under
    jit; the reference has no compile cache to worry about).
    """

    def __init__(
        self,
        dims: tuple[int, ...],
        divisor: int = 8,
        mode: str = "sintel",
        bucket: int | None = None,
    ):
        self.ht, self.wd = dims[-3:-1] if len(dims) >= 3 else dims
        d = max(divisor, bucket or 0)
        pad_ht = (d - self.ht % d) % d
        pad_wd = (d - self.wd % d) % d
        if mode == "sintel":
            # (left, right, top, bottom)
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    @property
    def padded_hw(self) -> tuple[int, int]:
        l, r, t, b = self._pad
        return self.ht + t + b, self.wd + l + r

    def pad(self, *inputs: Array):
        l, r, t, b = self._pad
        outs = [
            jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(t, b), (l, r), (0, 0)], mode="edge")
            for x in inputs
        ]
        return outs if len(outs) > 1 else outs[0]

    def unpad(self, x: Array) -> Array:
        l, r, t, b = self._pad
        ht, wd = x.shape[-3:-1]
        return x[..., t : ht - b, l : wd - r, :]


def pad_reflect(x: Array, pad: int = 1) -> Array:
    """Reflect-pad H and W of an NHWC tensor (torch F.pad mode='reflect')."""
    return jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
