"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8); the real-TPU bench path
is exercised separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin may have imported jax before this conftest, locking in the
# default (TPU) platform from the parent environment — force CPU via config,
# which works as long as no backend client has been created yet.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
