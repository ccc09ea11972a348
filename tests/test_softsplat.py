"""softsplat parity vs a direct numpy transcription of the kernel semantics,
plus autodiff gradient checks (the reference ships hand-written CUDA
backward kernels; here JAX autodiff must reproduce them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gimmvfi_tpu.ops.softsplat import softsplat, _splat_core


def numpy_splat(ten_in, flow):
    """Scalar-loop golden: bilinear scatter-add (softsplat_out semantics)."""
    n, h, w, c = ten_in.shape
    out = np.zeros_like(ten_in)
    for b in range(n):
        for i in range(h):
            for j in range(w):
                x = j + flow[b, i, j, 0]
                y = i + flow[b, i, j, 1]
                if not (np.isfinite(x) and np.isfinite(y)):
                    continue
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                for (xi, yi, wgt) in [
                    (x0, y0, (x0 + 1 - x) * (y0 + 1 - y)),
                    (x0 + 1, y0, (x - x0) * (y0 + 1 - y)),
                    (x0, y0 + 1, (x0 + 1 - x) * (y - y0)),
                    (x0 + 1, y0 + 1, (x - x0) * (y - y0)),
                ]:
                    if 0 <= xi < w and 0 <= yi < h:
                        out[b, yi, xi] += ten_in[b, i, j] * wgt
    return out


def test_splat_core_matches_numpy(rng):
    ten_in = rng.standard_normal((2, 6, 7, 3), dtype=np.float32)
    flow = (rng.standard_normal((2, 6, 7, 2)) * 2.5).astype(np.float32)
    ref = numpy_splat(ten_in, flow)
    out = _splat_core(jnp.asarray(ten_in), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_splat_core_nonfinite_flow_skipped(rng):
    ten_in = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
    flow = np.zeros((1, 4, 4, 2), dtype=np.float32)
    flow[0, 1, 1, 0] = np.nan
    flow[0, 2, 2, 1] = np.inf
    ref = numpy_splat(ten_in, flow)
    out = _splat_core(jnp.asarray(ten_in), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


@pytest.mark.parametrize(
    "mode", ["sum", "avg", "linear", "softmax", "softmax-zeroeps", "linear-clipeps"]
)
def test_modes_match_semantics(rng, mode):
    ten_in = rng.standard_normal((1, 5, 6, 2), dtype=np.float32)
    flow = (rng.standard_normal((1, 5, 6, 2)) * 1.5).astype(np.float32)
    metric = rng.standard_normal((1, 5, 6, 1)).astype(np.float32)
    base = mode.split("-")[0]

    m = jnp.asarray(metric) if base in ("linear", "softmax") else None
    out = softsplat(jnp.asarray(ten_in), jnp.asarray(flow), m, mode)

    # golden: numpy transcription of the wrapper (softsplat.py:286-352)
    x = ten_in
    if base == "avg":
        x = np.concatenate([x, np.ones((1, 5, 6, 1), np.float32)], -1)
    elif base == "linear":
        x = np.concatenate([x * metric, metric], -1)
    elif base == "softmax":
        x = np.concatenate([x * np.exp(metric), np.exp(metric)], -1)
    ref = numpy_splat(x, flow)
    if base != "sum":
        norm = ref[..., -1:]
        eps = mode.split("-")[1] if "-" in mode else "addeps"
        if eps == "addeps":
            norm = norm + 1e-7
        elif eps == "zeroeps":
            norm = np.where(norm == 0.0, 1.0, norm)
        elif eps == "clipeps":
            norm = np.clip(norm, 1e-7, None)
        ref = ref[..., :-1] / norm
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_grad_matches_finite_differences(rng):
    """d(loss)/d(in) and d(loss)/d(flow) vs central finite differences."""
    ten_in = rng.standard_normal((1, 4, 5, 2), dtype=np.float32)
    # keep flow away from integer corners so floor() is locally constant
    flow = (rng.random((1, 4, 5, 2), dtype=np.float32) * 1.4 + 0.17).astype(np.float32)

    def loss(t, f):
        out = _splat_core(t, f)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_in, g_flow = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(ten_in), jnp.asarray(flow)
    )

    eps = 1e-3
    for idx in [(0, 1, 2, 0), (0, 3, 4, 1), (0, 0, 0, 0)]:
        for which, g in [(0, g_in), (1, g_flow)]:
            args = [np.array(ten_in), np.array(flow)]
            args[which][idx] += eps
            up = float(loss(jnp.asarray(args[0]), jnp.asarray(args[1])))
            args[which][idx] -= 2 * eps
            dn = float(loss(jnp.asarray(args[0]), jnp.asarray(args[1])))
            fd = (up - dn) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, atol=2e-2, rtol=2e-2)


def test_splat_is_deterministic(rng):
    """XLA scatter-add has fixed reduction order (improvement over atomicAdd)."""
    ten_in = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    # all pixels collapse onto a few targets -> heavy accumulation collisions
    flow = jnp.asarray((rng.standard_normal((2, 16, 16, 2)) * 16).astype(np.float32))
    a = _splat_core(ten_in, flow)
    b = _splat_core(ten_in, flow)
    assert (np.asarray(a) == np.asarray(b)).all()
