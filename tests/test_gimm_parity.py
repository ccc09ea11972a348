"""Stage-1 GIMM model parity vs the reference torch GIMM (random weights)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)]


@pytest.fixture(scope="module")
def ref_gimm():
    import ref_compat

    ref_compat.install_stubs()
    import torch

    import src.models.generalizable_INR.gimm as ref_mod

    ref_mod.softsplat = ref_compat.patched_softsplat
    torch.manual_seed(0)
    cfg = ref_compat.gimmvfi_config()  # same hyponet/coord_range fields
    model = ref_mod.GIMM(cfg)
    model.eval()
    return model


def test_gimm_forward_parity(ref_gimm, rng):
    import torch

    from gimmvfi_tpu.models.gimm import GIMM
    from gimmvfi_tpu.utils.convert import convert_gimm

    b, h, w = 2, 48, 64
    nflows = rng.random((b, 2, h, w, 2), dtype=np.float32)  # [0,1]
    ori = (rng.standard_normal((b, 2, h, w, 2)) * 3).astype(np.float32)
    t = np.asarray([0.25, 0.75], np.float32)

    # reference wants (B, C, T, H, W)
    xs_t = torch.from_numpy(nflows.transpose(0, 4, 1, 2, 3).copy())
    ori_t = torch.from_numpy(ori.transpose(0, 4, 1, 2, 3).copy())
    tt = torch.from_numpy(t)
    with torch.no_grad():
        coord = ref_gimm.sample_coord_input(b, (h, w), tt, device=xs_t.device)
        ref_out = ref_gimm(
            xs_t, coord=coord, ori_flow=ori_t, timesteps=tt
        )  # (B, 2, 1, H, W)

    sd = {k: v.detach().numpy() for k, v in ref_gimm.state_dict().items()}
    params, _ = convert_gimm(sd)
    model = GIMM()
    out = model.apply(
        {"params": params}, jnp.asarray(nflows), jnp.asarray(ori), jnp.asarray(t)
    )  # (B, 1, H, W, 2)

    ref_np = ref_out.numpy().transpose(0, 2, 3, 4, 1)  # (B, 1, H, W, 2)
    np.testing.assert_allclose(np.asarray(out), ref_np, atol=1e-4)
