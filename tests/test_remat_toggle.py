"""remat=False (inference mode) is bit-exact vs remat=True (training mode).

GIMMVFI_R/F wrap their submodules in nn.remat for the training backward;
bench/CLI inference paths construct the model with remat=False to keep
the forward HLO free of remat call boundaries. The wrapper must be a pure
no-op on values AND on the parameter tree — the same checkpoint serves
both modes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gimmvfi_tpu.models.gimm import GIMM
from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R


def test_remat_false_is_exact(rng):
    img = jnp.asarray(rng.random((1, 2, 32, 32, 3), np.float32))

    outs, trees = {}, {}
    for remat in (True, False):
        m = GIMMVFI_R(raft_iters=1, remat=remat)
        v = jax.jit(lambda r, x, m=m: m.init(r, x, (0.5,)))(
            jax.random.PRNGKey(0), img
        )
        trees[remat] = jax.tree_util.tree_structure(v)
        outs[remat] = jax.jit(
            lambda v, x, m=m: m.apply(v, x, (0.5,))["imgt_pred"][0]
        )(v, img)

    assert trees[True] == trees[False]  # checkpoints interchangeable
    assert float(jnp.abs(outs[True] - outs[False]).max()) == 0.0


def test_gimm_remat_is_exact(rng):
    """Stage-1 GIMM remat (encoder/refiner blocks): same tree, same values,
    same grads — the stage-1 recipe needs it to fit a 16 GB v5e."""
    xs = jnp.asarray(rng.random((1, 2, 32, 32, 2), np.float32))
    ori = jnp.asarray(rng.standard_normal((1, 2, 32, 32, 2)).astype(np.float32))
    t = jnp.full((1,), 0.5, jnp.float32)

    m0, m1 = GIMM(), GIMM(remat=True)
    v = jax.jit(lambda r: m0.init(r, xs, ori, t))(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        jax.eval_shape(lambda r: m1.init(r, xs, ori, t), jax.random.PRNGKey(0))
    )

    o0 = jax.jit(lambda v: m0.apply(v, xs, ori, t))(v)
    o1 = jax.jit(lambda v: m1.apply(v, xs, ori, t))(v)
    assert float(jnp.abs(o0 - o1).max()) == 0.0

    g0 = jax.jit(jax.grad(lambda p: m0.apply({"params": p}, xs, ori, t).sum()))(
        v["params"]
    )
    g1 = jax.jit(jax.grad(lambda p: m1.apply({"params": p}, xs, ori, t).sum()))(
        v["params"]
    )
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
