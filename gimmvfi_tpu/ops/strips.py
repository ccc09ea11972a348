"""Vertical-strip space-to-batch for full-resolution conv stacks.

XLA's TPU conv hits ~55 TFLOP/s on (1, 736, 1280, 256) but ~110-120 on the
same pixels as a batch of 8 narrow strips (measured: the fast conv mode
needs batch >= 8). A stack of K SAME 3x3 convs stays EXACT on strips when:

  * interior seams carry a halo of K true neighbor columns per side — each
    conv consumes one halo column per side (its per-strip zero padding only
    contaminates the outermost column, which is halo), and `from_strips`
    keeps only the valid center;
  * the OUTER strips' buffer edges coincide with the true image edges, so
    the conv's own SAME zero-padding applies there at every layer exactly
    as in the unsplit computation (a zero halo would be wrong: it stays
    zero only through the first layer). The outer strips' windows are
    shifted inward to keep all buffers the same width; `from_strips`
    compensates with per-strip valid offsets.

Rows are never split, so top/bottom padding is untouched. Used by the AMT
decoders (models/synthesis.py) whose 256-channel full-res ResBlock stacks
dominate decode time. ~1.6x on the conv segment at 720p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _starts(w: int, sw: int, bw: int, k: int) -> list[int]:
    return [min(max(i * sw - (bw - sw) // 2, 0), w - bw) for i in range(k)]


# perf-only master switch: bench.py turns strips off when counting
# reference-equivalent FLOPs (the halo duplicates ~20% of the conv work,
# which the reference never does)
ENABLED = True


def strip_worthwhile(w: int, k: int, halo: int) -> bool:
    """Exactness and efficiency gate: strips divide W evenly, every strip is
    at least `halo` wide (interior windows stay in-bounds), and the halo
    overhead stays below 2x."""
    if not ENABLED or w % k != 0:
        return False
    sw = w // k
    return sw >= halo and sw + 2 * halo <= 2 * sw


def to_strips(x: Array, halo: int, k: int = 8) -> Array:
    """(N, H, W, C) -> (k*N, H, W/k + 2*halo, C), strip-major batch.

    Strip i covers valid columns [i*sw, (i+1)*sw) inside a buffer window of
    sw + 2*halo columns clamped to the image; outer buffers end exactly at
    the image edges (see module docstring)."""
    n, h, w, c = x.shape
    assert w % k == 0, (w, k)
    sw = w // k
    bw = sw + 2 * halo
    assert bw <= w, (w, halo, k)
    parts = [x[:, :, s : s + bw] for s in _starts(w, sw, bw, k)]
    return jnp.concatenate(parts, axis=0)


def from_strips(s: Array, halo: int, k: int = 8) -> Array:
    """Invert `to_strips`, keeping each strip's valid columns."""
    kn, h, bw, c = s.shape
    n = kn // k
    sw = bw - 2 * halo
    w = k * sw
    outs = []
    for i, start in enumerate(_starts(w, sw, bw, k)):
        off = i * sw - start
        outs.append(s[i * n : (i + 1) * n, :, off : off + sw])
    return jnp.concatenate(outs, axis=2)
