"""Fast API tests for GIMM: list-of-t forward parity with the per-t path
(reference `gimm.py:150-210` accepts a list of timesteps in one call) and the
HypoNet activation config (`modules/module_config.py:16-41`).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gimmvfi_tpu.models.gimm import GIMM
from gimmvfi_tpu.models.hyponet import HypoNet


def test_forward_multi_matches_per_t_calls(rng):
    model = GIMM()
    n, h, w = 2, 32, 48
    xs = jnp.asarray(rng.uniform(0, 1, (n, 2, h, w, 2)), jnp.float32)
    ori = jnp.asarray(rng.normal(0, 3, (n, 2, h, w, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xs, ori, jnp.full((n,), 0.5))

    ts = jnp.asarray([0.0, 0.25, 0.5, 1.0], jnp.float32)
    multi = model.apply(variables, xs, ori, ts, method=model.forward_multi)
    assert multi.shape == (n, len(ts), h, w, 2)

    for i, t in enumerate(np.asarray(ts)):
        single = model.apply(variables, xs, ori, jnp.full((n,), t, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(multi[:, i]), np.asarray(single[:, 0]), atol=1e-5
        )


def test_hyponet_damping_activation(rng):
    net = HypoNet(n_layer=3, hidden_dim=16, activation="damping")
    coord = jnp.asarray(rng.uniform(-1, 1, (1, 1, 8, 8, 3)), jnp.float32)
    lat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 32)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), coord, lat)
    out = net.apply(variables, coord, lat)
    assert out.shape == (1, 1, 8, 8, 2)
    sine_net = HypoNet(n_layer=3, hidden_dim=16, activation="sine")
    out_sine = sine_net.apply(variables, coord, lat)
    assert not np.allclose(np.asarray(out), np.asarray(out_sine))
