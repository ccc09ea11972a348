"""LPIPS parity vs the reference vendored implementation.

Backbone weights are random (no torchvision downloads on this box); the
linear heads load from the reference's bundled alex.pth when present, so the
conversion path for the released artifact is exercised for real.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)

ALEX_PTH = "/root/reference/src/utils/lpips/alex.pth"


@pytest.fixture(scope="module")
def ref_lpips():
    import ref_compat

    ref_compat.install_stubs()
    import torch

    from src.utils.lpips.lpips import LPIPS as TorchLPIPS

    torch.manual_seed(0)
    model = TorchLPIPS(
        pretrained=os.path.exists(ALEX_PTH),
        net="alex",
        model_path=ALEX_PTH,
        verbose=False,
    )
    model.eval()
    return model


def test_lpips_parity(ref_lpips, rng):
    import torch

    from gimmvfi_tpu.train.lpips import LPIPS
    from gimmvfi_tpu.utils.convert import convert_lpips

    sd = {k: v.detach().numpy() for k, v in ref_lpips.state_dict().items()}
    params, stats = convert_lpips(sd)
    assert not stats

    h, w = 64, 64
    a = rng.random((2, h, w, 3)).astype(np.float32)
    b = rng.random((2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        ref = ref_lpips(
            torch.from_numpy(a.transpose(0, 3, 1, 2).copy()) * 2 - 1,
            torch.from_numpy(b.transpose(0, 3, 1, 2).copy()) * 2 - 1,
        ).numpy()

    model = LPIPS()
    out = model.apply({"params": params}, jnp.asarray(a), jnp.asarray(b),
                      normalize=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1), ref.reshape(-1), atol=1e-5, rtol=1e-4
    )


def test_lpips_identical_images_zero(ref_lpips, rng):
    from gimmvfi_tpu.train.lpips import LPIPS, calc_lpips
    from gimmvfi_tpu.utils.convert import convert_lpips

    sd = {k: v.detach().numpy() for k, v in ref_lpips.state_dict().items()}
    params, _ = convert_lpips(sd)
    a = rng.random((1, 64, 64, 3)).astype(np.float32)
    model = LPIPS()
    d = calc_lpips(model, {"params": params}, jnp.asarray(a), jnp.asarray(a))
    assert float(np.asarray(d).reshape(())) == pytest.approx(0.0, abs=1e-9)
