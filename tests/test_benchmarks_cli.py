"""Benchmark-harness CLI smoke on synthetic fixtures.

Proves the SNU-FILM-arb / VTF / VSF harnesses run end to end (dataset
enumeration, padding, sequential decode, metric computation) without the real
datasets or released checkpoints.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_png(path, h, w, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, (rng.random((h, w, 3)) * 255).astype(np.uint8))


@pytest.fixture(scope="module")
def vfi_ckpt(tmp_path_factory):
    """Random-weights GIMMVFI_R saved as an orbax checkpoint."""
    import orbax.checkpoint as ocp

    from gimmvfi_tpu.models.gimmvfi_r import GIMMVFI_R

    model = GIMMVFI_R(raft_iters=2)
    x = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    variables = dict(
        jax.jit(lambda r, x: model.init(r, x, (0.5,)))(jax.random.PRNGKey(0), x)
    )
    variables.setdefault("batch_stats", {})
    path = tmp_path_factory.mktemp("ckpt") / "vfi"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(variables))
    ckptr.wait_until_finished()
    return str(path)


def test_snu_film_arb_harness(tmp_path, vfi_ckpt):
    from gimmvfi_tpu.cli.benchmarks import main

    root = str(tmp_path / "snu")
    row = []
    for k in range(5):  # i0, 3 gts, i1 for the 4-step medium split
        rel = f"frames/{k}.png"
        _write_png(os.path.join(root, rel), 128, 128, seed=k)
        row.append(rel)
    with open(os.path.join(root, "test-arb-medium.txt"), "w") as f:
        f.write(" ".join(row) + "\n")

    main(
        [
            "snu_film_arb", "--data-root", root, "--ckpt", vfi_ckpt,
            "--flow-iters", "2",
        ]
    )


def test_vtf_and_vsf_harnesses(tmp_path, capsys):
    """Stage-1 motion benchmarks on synthetic .flo fixtures."""
    import orbax.checkpoint as ocp

    from gimmvfi_tpu.cli.benchmarks import main
    from gimmvfi_tpu.data.frame_io import write_flo
    from gimmvfi_tpu.models.gimm import GIMM
    from gimmvfi_tpu.utils.convert import convert_gimm

    # GIMM weights in the *reference torch layout* via a tiny fake state dict
    # is overkill — save jax params and monkeypatch? Simpler: build a torch-
    # layout state dict from a random jax init using the converter inverse is
    # not available, so use a real torch-format file only when torch exists.
    torch = pytest.importorskip("torch")

    import ref_compat

    ref_compat.install_stubs()
    import src.models.generalizable_INR.gimm as ref_gimm_mod

    ref_gimm_mod.softsplat = ref_compat.patched_softsplat
    cfg = ref_compat.gimmvfi_config()
    cfg.type = "gimm"
    torch.manual_seed(0)
    ref_model = ref_gimm_mod.GIMM(cfg)
    ckpt = str(tmp_path / "gimm_random.pt")
    torch.save({"state_dict": ref_model.state_dict()}, ckpt)

    rng = np.random.default_rng(0)

    # ---- VTF fixture
    vtf_root = str(tmp_path / "vtf")
    seqs = ["00001/0001", "00001/0002"]
    for s in seqs:
        d = os.path.join(vtf_root, "flow_sequences", s)
        os.makedirs(d, exist_ok=True)
        for name in ("im1_im3", "im2_im3", "im2_im1", "im3_im1"):
            write_flo(os.path.join(d, f"{name}.flo"),
                      rng.random((64, 64, 2)).astype(np.float32) * 4 - 2)
    with open(os.path.join(vtf_root, "tri_testlist.txt"), "w") as f:
        f.write("\n".join(seqs) + "\n")
    main(["vtf", "--data-root", vtf_root, "--ckpt", ckpt])
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(res["psnr"]) and np.isfinite(res["epe"])

    # ---- VSF fixture (septuplet flows)
    vsf_root = str(tmp_path / "vsf")
    for s in seqs:
        d = os.path.join(vsf_root, "flow_sequences", s)
        os.makedirs(d, exist_ok=True)
        names = ["im1_im7", "im7_im1"] + [
            f"im{t}_im7" for t in range(2, 7)
        ] + [f"im{t}_im1" for t in range(2, 7)]
        for name in names:
            write_flo(os.path.join(d, f"{name}.flo"),
                      rng.random((64, 64, 2)).astype(np.float32) * 4 - 2)
    with open(os.path.join(vsf_root, "sep_testlist.txt"), "w") as f:
        f.write("\n".join(seqs) + "\n")
    main(["vsf", "--data-root", vsf_root, "--ckpt", ckpt])
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(res["psnr"]) and np.isfinite(res["epe"])
