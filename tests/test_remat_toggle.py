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
