"""FlowFormer + GIMM-VFI-F parity vs the reference PyTorch implementation.

Builds the reference FlowFormer (vendored Twins backbone, random weights) on
CPU, converts its state_dict with utils/convert.convert_flowformer /
convert_gimmvfi_f, and compares outputs stage by stage.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)]

FF_ITERS = 3  # single CPU core: cap the 32-iteration decoder on both sides


@pytest.fixture(scope="module")
def ref_flowformer():
    import ref_compat

    ref_compat.install_stubs()
    import torch

    from src.models.generalizable_INR.flowformer.configs.submission import get_cfg
    from src.models.generalizable_INR.flowformer.core.FlowFormer import (
        build_flowformer,
    )

    torch.manual_seed(0)
    model = build_flowformer(get_cfg())
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_flowformer(ref_flowformer):
    from gimmvfi_tpu.flow.flowformer import FlowFormer
    from gimmvfi_tpu.utils.convert import convert_flowformer

    sd = {k: v.detach().numpy() for k, v in ref_flowformer.state_dict().items()}
    params, stats = convert_flowformer(sd)
    assert not stats  # no BatchNorm anywhere in FlowFormer
    return FlowFormer(iters=FF_ITERS), {"params": params}


def test_twins_encoder_parity(ref_flowformer, jax_flowformer, rng):
    """Truncated twins_svt_large: context features at 1/4 and 1/8."""
    import torch

    model, variables = jax_flowformer
    h, w = 64, 64
    img = (rng.random((1, h, w, 3)) * 2 - 1).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        ctx_ref, cfeat_ref = ref_flowformer.context_encoder(t_in, return_feat=True)

    from gimmvfi_tpu.flow.twins import TwinsSVTLarge2Stage

    twins = TwinsSVTLarge2Stage()
    ctx, cfeat = twins.apply(
        {"params": variables["params"]["context_encoder"]}, jnp.asarray(img)
    )
    np.testing.assert_allclose(
        np.asarray(ctx), ctx_ref.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=2e-2
    )
    for mine, ref in zip(cfeat, cfeat_ref):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=2e-2
        )


def test_flowformer_forward_parity(ref_flowformer, jax_flowformer, rng):
    """Full FlowFormer forward: flow + context features + matching feature."""
    import torch

    model, variables = jax_flowformer
    h, w = 64, 64
    img1 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    img2 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2).copy())
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2).copy())
        (flow_ref, _lowres), cfeat_ref, ffeat_ref = ref_flowformer(
            t1, t2, return_feat=True, iters=FF_ITERS
        )

    flow, cfeat, ffeat = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2))

    np.testing.assert_allclose(
        np.asarray(ffeat),
        ffeat_ref.numpy().transpose(0, 2, 3, 1),
        atol=1e-3,
        rtol=2e-2,
    )
    for mine, ref in zip(cfeat, cfeat_ref):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=2e-2
        )
    np.testing.assert_allclose(
        np.asarray(flow), flow_ref.numpy().transpose(0, 2, 3, 1), atol=5e-3, rtol=1e-2
    )


@pytest.fixture(scope="module")
def ref_gimmvfi_f(ref_flowformer):
    import ref_compat

    ref_compat.install_stubs()
    import torch

    import src.models.generalizable_INR.gimmvfi_f as ref_mod

    ref_mod.initialize_Flowformer = lambda: ref_flowformer
    ref_mod.softsplat = ref_compat.patched_softsplat

    torch.manual_seed(1)
    cfg = ref_compat.gimmvfi_config()
    cfg.type = "gimmvfi_f"
    model = ref_mod.GIMMVFI_F(cfg)
    model.eval()

    # cap the decoder iterations on both sides (reference passes iters=None
    # -> decoder_depth=32; too slow for the single-core CI box)
    inner_forward = model.flow_estimator.forward
    model.flow_estimator.forward = (
        lambda im0, im1, output=None, flow_init=None, return_feat=False, iters=None: (
            inner_forward(
                im0, im1, output=output, flow_init=flow_init,
                return_feat=return_feat, iters=FF_ITERS,
            )
        )
    )
    return model


def test_gimmvfi_f_interpolate_parity(ref_gimmvfi_f, rng):
    import torch

    from gimmvfi_tpu.models.gimmvfi_f import GIMMVFI_F
    from gimmvfi_tpu.utils.convert import convert_gimmvfi_f

    sd = {k: v.detach().numpy() for k, v in ref_gimmvfi_f.state_dict().items()}
    params, stats = convert_gimmvfi_f(sd)
    model = GIMMVFI_F(ff_iters=FF_ITERS)
    variables = {"params": params, "batch_stats": stats}

    h, w = 128, 128
    base = rng.random((1, 2, h // 8, w // 8, 3)).astype(np.float32)
    img = np.stack(
        [np.kron(base[:, i], np.ones((1, 8, 8, 1), np.float32)) for i in range(2)],
        axis=1,
    )
    ts = (0.5,)

    xs = torch.from_numpy(img.transpose(0, 4, 1, 2, 3).copy())  # (B, C, T, H, W)
    b = xs.shape[0]
    with torch.no_grad():
        coord_inputs = [
            (ref_gimmvfi_f.sample_coord_input(b, (h, w), [tv], device=xs.device), None)
            for tv in ts
        ]
        timesteps = [torch.full((b,), tv).float() for tv in ts]
        ref_out = ref_gimmvfi_f(xs, coord_inputs, t=timesteps)

    out = model.apply(variables, jnp.asarray(img), ts, method=model.interpolate)

    ref_img = ref_out["imgt_pred"][0].numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["imgt_pred"][0]), ref_img, atol=2e-3)
    ref_flow = ref_out["flowt"][0].numpy()
    if ref_flow.ndim == 3:
        ref_flow = ref_flow[None]
    np.testing.assert_allclose(
        np.asarray(out["flowt"][0]), ref_flow.transpose(0, 2, 3, 1), atol=2e-3
    )
