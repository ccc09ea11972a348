"""RAFT flax model parity vs the reference PyTorch RAFT (random weights,
converted with utils/convert.convert_raft, CPU, small input)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)]


@pytest.fixture(scope="module")
def ref_raft():
    import ref_compat

    ref_compat.install_stubs()
    import argparse

    import torch
    from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0
    )
    # argparse.Namespace provides _get_kwargs used by the reference
    torch.manual_seed(0)
    model = TorchRAFT(args)
    model.eval()
    return model


def test_raft_forward_parity(ref_raft, rng):
    import torch

    from gimmvfi_tpu.flow.raft import RAFT
    from gimmvfi_tpu.utils.convert import convert_raft

    iters = 3
    h, w = 128, 128
    img1 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    img2 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)

    with torch.no_grad():
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2).copy())
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2).copy())
        flow_ref, feats_ref, fmap1_ref = ref_raft(t1, t2, iters=iters, return_feat=True)

    sd = {k: v.detach().numpy() for k, v in ref_raft.state_dict().items()}
    params, stats = convert_raft(sd)

    model = RAFT(iters=iters)
    flow, feats, fmap1 = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(img1),
        jnp.asarray(img2),
    )

    np.testing.assert_allclose(
        np.asarray(fmap1),
        fmap1_ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
        rtol=1e-3,
    )
    for mine, ref in zip(feats, feats_ref):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
    np.testing.assert_allclose(
        np.asarray(flow), flow_ref.numpy().transpose(0, 2, 3, 1), atol=5e-3, rtol=1e-2
    )


def test_raft_windowed_corr_matches_materialized(rng):
    """Forcing the memory-efficient windowed-correlation path (tiny
    corr_max_volume_bytes) must reproduce the materialized-volume flow."""
    import jax
    import jax.numpy as jnp

    from gimmvfi_tpu.flow.raft import RAFT

    imgs = (rng.random((1, 64, 96, 3)) * 255).astype(np.float32)
    imgs2 = (rng.random((1, 64, 96, 3)) * 255).astype(np.float32)
    i1, i2 = jnp.asarray(imgs), jnp.asarray(imgs2)

    base = RAFT(iters=4)
    variables = jax.jit(lambda a, b: base.init(jax.random.PRNGKey(0), a, b))(i1, i2)

    flow_ref, feats_ref, f1_ref = jax.jit(
        lambda v, a, b: base.apply(v, a, b, bidir=True)
    )(variables, i1, i2)

    win = RAFT(iters=4, corr_max_volume_bytes=1)
    flow_win, feats_win, f1_win = jax.jit(
        lambda v, a, b: win.apply(v, a, b, bidir=True)
    )(variables, i1, i2)

    np.testing.assert_allclose(
        np.asarray(flow_win), np.asarray(flow_ref), atol=5e-4
    )
