"""Fast-tier parity canaries (advisor r4).

Tiny-shape torch-golden cases that gate the refactor-sensitive paths at
commit time without the slow-tier parity monsters: the mask-head hoist
(`flow/raft.py` UpsampleMaskHead outside the scan) and the batched
softsplat decode (`models/gimm.py`). Full-coverage parity lives in the
`slow`-marked suites.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree unavailable"
)


def test_raft_tiny_parity(rng):
    import ref_compat

    ref_compat.install_stubs()
    import argparse

    import torch
    from src.models.generalizable_INR.raft.raft import RAFT as TorchRAFT

    from gimmvfi_tpu.flow.raft import RAFT
    from gimmvfi_tpu.utils.convert import convert_raft

    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0
    )
    torch.manual_seed(0)
    ref = TorchRAFT(args)
    ref.eval()

    # 128 is the smallest NaN-free reference size: below 16x16 at 1/8 the
    # torch CorrBlock's coarsest pyramid level degenerates to 1x1 and the
    # reference produces NaN flow
    iters, h, w = 2, 128, 128
    img1 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    img2 = (rng.random((1, h, w, 3)) * 255).astype(np.float32)
    with torch.no_grad():
        flow_ref, _, _ = ref(
            torch.from_numpy(img1.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(img2.transpose(0, 3, 1, 2).copy()),
            iters=iters,
            return_feat=True,
        )

    params, stats = convert_raft(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    flow, _, _ = RAFT(iters=iters).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(img1),
        jnp.asarray(img2),
    )
    np.testing.assert_allclose(
        np.asarray(flow),
        flow_ref.numpy().transpose(0, 2, 3, 1),
        atol=5e-3,
        rtol=1e-2,
    )


def test_gimm_tiny_parity(rng):
    import ref_compat

    ref_compat.install_stubs()
    import torch

    import src.models.generalizable_INR.gimm as ref_mod

    from gimmvfi_tpu.models.gimm import GIMM
    from gimmvfi_tpu.utils.convert import convert_gimm

    ref_mod.softsplat = ref_compat.patched_softsplat
    torch.manual_seed(0)
    ref = ref_mod.GIMM(ref_compat.gimmvfi_config())
    ref.eval()

    b, h, w = 1, 32, 32
    nflows = rng.random((b, 2, h, w, 2), dtype=np.float32)
    ori = (rng.standard_normal((b, 2, h, w, 2)) * 3).astype(np.float32)
    t = np.asarray([0.375], np.float32)

    xs_t = torch.from_numpy(nflows.transpose(0, 4, 1, 2, 3).copy())
    ori_t = torch.from_numpy(ori.transpose(0, 4, 1, 2, 3).copy())
    tt = torch.from_numpy(t)
    with torch.no_grad():
        coord = ref.sample_coord_input(b, (h, w), tt, device=xs_t.device)
        ref_out = ref(xs_t, coord=coord, ori_flow=ori_t, timesteps=tt)

    params, _ = convert_gimm(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    out = GIMM().apply(
        {"params": params}, jnp.asarray(nflows), jnp.asarray(ori), jnp.asarray(t)
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 4, 1), atol=1e-4
    )
