"""Importing any gimmvfi_tpu module must NOT initialize a JAX backend.

A module-level jnp op forces platform selection at import time, which kills
late platform pinning — the exact failure mode of the round-2 multichip
dryrun (`train/losses.py` module-level `jnp.array` initializing the axon TPU
backend inside a CPU-only subprocess). Run in a subprocess so this test is
independent of pytest's own backend state.
"""

import pathlib
import subprocess
import sys

PKG_ROOT = pathlib.Path(__file__).resolve().parents[1]

_CHECK = r"""
import pathlib, pkgutil, sys

root = pathlib.Path(sys.argv[1]) / "gimmvfi_tpu"
names = []
for m in pkgutil.walk_packages([str(root)], prefix="gimmvfi_tpu."):
    names.append(m.name)
assert len(names) > 20, f"module walk looks broken: {names}"

for name in sorted(names):
    __import__(name)

import jax._src.xla_bridge as xb
backends = xb._backends
assert not backends, (
    "importing gimmvfi_tpu modules initialized JAX backend(s) "
    f"{list(backends)} — some module runs a jnp op at import time"
)
print("OK", len(names))
"""


def test_package_import_creates_no_backend():
    # No JAX_PLATFORMS / XLA_FLAGS leakage: the point is that imports are
    # safe even when the default platform would be a broken TPU tunnel.
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK, str(PKG_ROOT)],
        capture_output=True,
        text=True,
        cwd=str(PKG_ROOT),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.startswith("OK"), proc.stdout
