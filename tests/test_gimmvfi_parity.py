"""End-to-end GIMM-VFI-R parity vs the reference PyTorch model.

Builds the reference model with random weights on CPU (softsplat CUDA kernel
replaced by a CPU transcription, RAFT loader patched to skip the missing
checkpoint), converts its state_dict with utils/convert.convert_gimmvfi_r,
and compares full interpolation outputs.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)]


@pytest.fixture(scope="module")
def ref_model():
    import ref_compat

    ref_compat.install_stubs()
    import argparse

    import torch

    import src.models.generalizable_INR.gimmvfi_r as ref_mod
    from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

    def fake_initialize_raft():
        args = argparse.Namespace(
            small=False, mixed_precision=False, alternate_corr=False, dropout=0
        )
        return TorchRAFT(args)

    ref_mod.initialize_RAFT = fake_initialize_raft
    ref_mod.softsplat = ref_compat.patched_softsplat

    torch.manual_seed(0)
    model = ref_mod.GIMMVFI_R(ref_compat.gimmvfi_config())
    model.eval()

    # this box has a single CPU core: cap RAFT at 4 iterations on both sides
    # (the reference hardcodes iters=20 in cal_bidirection_flow)
    inner_forward = model.flow_estimator.forward
    model.flow_estimator.forward = (
        lambda im0, im1, iters=20, return_feat=True: inner_forward(
            im0, im1, iters=RAFT_ITERS, return_feat=return_feat
        )
    )
    return model


RAFT_ITERS = 4


@pytest.fixture(scope="module")
def jax_model_and_params(ref_model):
    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R
    from gimmvfi_tpu.utils.convert import convert_gimmvfi_r

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_gimmvfi_r(sd)
    model = GIMMVFI_R(raft_iters=RAFT_ITERS)
    return model, {"params": params, "batch_stats": stats}


def _run_reference(ref_model, img_xs_nhwc, ts, ds_factor=None):
    import torch

    xs = torch.from_numpy(
        img_xs_nhwc.transpose(0, 4, 1, 2, 3).copy()
    )  # (B, C, T, H, W)
    b = xs.shape[0]
    h, w = xs.shape[-2:]
    with torch.no_grad():
        coord_inputs = [
            (
                ref_model.sample_coord_input(
                    b, (h, w), [tv], device=xs.device,
                    upsample_ratio=ds_factor if ds_factor else 1.0,
                ),
                None,
            )
            for tv in ts
        ]
        timesteps = [torch.full((b,), tv).float() for tv in ts]
        out = ref_model(xs, coord_inputs, t=timesteps, ds_factor=ds_factor)
    return out


@pytest.mark.parametrize("ts", [(0.5,), (0.25, 0.625)])
def test_interpolate_parity(ref_model, jax_model_and_params, rng, ts):
    model, variables = jax_model_and_params
    h, w = 128, 128
    # smooth-ish images (tile small noise up) to keep flows moderate
    base = rng.random((1, 2, h // 8, w // 8, 3)).astype(np.float32)
    img = np.stack(
        [
            np.kron(base[:, i], np.ones((1, 8, 8, 1), np.float32))
            for i in range(2)
        ],
        axis=1,
    )

    ref_out = _run_reference(ref_model, img, ts)

    out = model.apply(
        variables, jnp.asarray(img), ts, method=model.interpolate
    )

    for i in range(len(ts)):
        ref_img = ref_out["imgt_pred"][i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out["imgt_pred"][i]), ref_img, atol=2e-3
        )
        ref_flow = ref_out["flowt"][i].numpy()
        if ref_flow.ndim == 3:
            ref_flow = ref_flow[None]
        else:
            ref_flow = ref_flow
        ref_flow = ref_flow.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out["flowt"][i]), ref_flow, atol=2e-3
        )


def test_interpolate_parity_ds_factor(ref_model, jax_model_and_params, rng):
    """DS_SCALE path: flow/synthesis at half res, final blend at full res.

    Input 256^2 so the half-res working grid still yields >=2x2 at the
    coarsest correlation level (the reference NaNs on 1x1 levels).
    """
    model, variables = jax_model_and_params
    h, w = 256, 256
    base = rng.random((1, 2, h // 8, w // 8, 3)).astype(np.float32)
    img = np.stack(
        [np.kron(base[:, i], np.ones((1, 8, 8, 1), np.float32)) for i in range(2)],
        axis=1,
    )

    ref_out = _run_reference(ref_model, img, (0.5,), ds_factor=0.5)
    out = model.apply(
        variables, jnp.asarray(img), (0.5,), 0.5, method=model.interpolate
    )
    ref_img = ref_out["imgt_pred"][0].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["imgt_pred"][0]), ref_img, atol=2e-3)
