"""bf16 mixed-precision inference agrees with the f32 reference path.

The production inference configuration runs conv/attention compute in
bfloat16 (MXU-native) with f32 flow/coordinate state and f32 parameters —
the SAME parameter tree serves both modes. This guards the dtype plumbing:
a stray f32 promotion shows up as a dtype assert, a precision-critical op
dropped to bf16 shows up as a PSNR collapse.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R


def test_bf16_matches_f32_psnr(rng):
    img = jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32))

    m32 = GIMMVFI_R(raft_iters=2)
    variables = jax.jit(lambda r, x: m32.init(r, x, (0.5,)))(
        jax.random.PRNGKey(0), img
    )
    p32 = jax.jit(
        lambda v, x: m32.apply(v, x, (0.5,), method=m32.interpolate)["imgt_pred"][0]
    )(variables, img)

    mbf = GIMMVFI_R(raft_iters=2, dtype=jnp.bfloat16)
    pbf = jax.jit(
        lambda v, x: mbf.apply(v, x, (0.5,), method=mbf.interpolate)["imgt_pred"][0]
    )(variables, img)

    assert p32.dtype == jnp.float32
    assert pbf.dtype == jnp.float32  # output always returns to f32

    a = np.asarray(p32, np.float32)
    b = np.asarray(pbf, np.float32)
    mse = float(((a - b) ** 2).mean())
    psnr = -10.0 * np.log10(mse + 1e-12)
    # observed ~74 dB; anything above 45 dB is far inside the 0.05 dB
    # PSNR-delta budget (BASELINE.md)
    assert psnr > 45.0, f"bf16-vs-f32 PSNR {psnr:.1f} dB"
