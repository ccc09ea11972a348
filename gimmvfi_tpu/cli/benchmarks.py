"""Evaluation benchmark harnesses: SNU-FILM-arb, X4K, VTF, VSF.

Rebuilds `src/SNU_FILM_arb.py`, `src/X4K.py`, `src/VTF.py`, `src/VSF.py` as
one CLI. Each harness loads a checkpoint, iterates its dataset, and reports
PSNR (+LPIPS when a converted LPIPS checkpoint is supplied) / EPE.

  python -m gimmvfi_tpu.cli.benchmarks snu_film_arb --data-root ... --ckpt ...
  python -m gimmvfi_tpu.cli.benchmarks x4k --data-root ... --ckpt ... --split 2k
  python -m gimmvfi_tpu.cli.benchmarks vtf --data-root ... --ckpt ...
"""

from __future__ import annotations

import argparse
import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.frame_io import read_flo, read_image
from ..models.gimmvfi_r import GIMMVFI_R
from ..models.gimm import GIMM
from ..ops.pad import InputPadder
from ..utils.metrics import compute_psnr_np
from .video_nx import load_model


def _interp_fn(model, variables):
    """Sequential per-timestep decode (lax.scan): one timestep's synthesis
    live at a time, so the 16-step SNU extreme split fits on-chip."""
    from ..models.gimmvfi_r import interpolate_sequential

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(xs, ts, ds):
        return interpolate_sequential(model, variables, xs, ts, ds)

    return lambda xs, ts, ds: run(xs, jnp.asarray(ts, jnp.float32), ds)


def _lpips_fn(lpips_path):
    """Optional LPIPS metric (reference harnesses report PSNR+LPIPS,
    `X4K.py:160-197`). Returns None when no weights are given."""
    if not lpips_path:
        return None
    from ..train.lpips import LPIPS, calc_lpips
    from ..utils.convert import convert_lpips, load_torch_state_dict

    params, _ = convert_lpips(load_torch_state_dict(lpips_path))
    model = LPIPS()

    @jax.jit
    def fn(gt, pred):
        return calc_lpips(model, {"params": params}, gt, pred)

    return lambda gt, pred: float(
        np.asarray(fn(jnp.asarray(gt[None]), jnp.asarray(pred[None]))).reshape(())
    )


# --------------------------------------------------------------- SNU-FILM-arb
def run_snu_film_arb(args):
    """Splits medium/hard/extreme -> 4/8/16-step arbitrary-t interpolation;
    one forward emits all t_i=(i+1)/T (`SNU_FILM_arb.py:78-170`).
    Reports PSNR + LPIPS (when --lpips-path given)."""
    model, variables = load_model(args.ckpt, args.model, args.flow_iters)
    run = _interp_fn(model, variables)
    lp = _lpips_fn(args.lpips_path)

    results = {}
    for split, t_step in (("medium", 4), ("hard", 8), ("extreme", 16)):
        list_path = os.path.join(args.data_root, f"test-arb-{split}.txt")
        if not os.path.exists(list_path):
            print(f"skip {split}: {list_path} missing")
            continue
        with open(list_path) as f:
            rows = [ln.split() for ln in f.read().splitlines() if ln.strip()]
        psnrs, lpips_vals = [], []
        for row in rows:
            frames = [read_image(os.path.join(args.data_root, p)) for p in row]
            i0, gts, i1 = frames[0], frames[1:-1], frames[-1]
            # bucketed padding: mixed-size eval sets compile once per bucket
            padder = InputPadder(i0.shape, 32, bucket=args.bucket)
            xs = jnp.stack(
                padder.pad(jnp.asarray(i0[None]), jnp.asarray(i1[None])), axis=1
            )
            ts = [(i + 1) / t_step for i in range(t_step - 1)]
            out = run(xs, ts, args.ds_factor if args.ds_factor != 1 else None)
            for gt, pred in zip(gts, out["imgt_pred"]):
                pred = np.asarray(padder.unpad(pred))[0]
                psnrs.append(compute_psnr_np(pred, gt))
                if lp is not None:
                    lpips_vals.append(lp(gt, pred))
        results[split] = {
            "psnr": float(np.mean(psnrs)) if psnrs else None,
            "lpips": float(np.mean(lpips_vals)) if lpips_vals else None,
        }
        print(f"SNU-FILM-arb {split}: {results[split]}")
    return results


# ------------------------------------------------------------------------ X4K
def _x4k_items(test_root: str, multiple: int = 8, t_step: int = 32):
    """XVFI-style test enumeration (`X4K.py:45-65`)."""
    items = []
    for typ in sorted(os.listdir(test_root)):
        type_dir = os.path.join(test_root, typ)
        if not os.path.isdir(type_dir):
            continue
        for scene in sorted(os.listdir(type_dir)):
            frames = sorted(
                os.path.join(type_dir, scene, f)
                for f in os.listdir(os.path.join(type_dir, scene))
            )
            for idx in range(0, len(frames) - t_step, t_step):
                for mul in range(multiple - 1):
                    t = (mul + 1) / multiple
                    items.append(
                        (
                            frames[idx],
                            frames[idx + t_step],
                            frames[idx + int(round(t_step * t))],
                            t,
                        )
                    )
    return items


def run_x4k(args):
    """XTEST 8x interpolation: 2k (resize 2048x1080, ds 0.5) or 4k (ds 0.25)
    (`X4K.py:90-197`). PSNR + LPIPS; --save-preds writes predictions."""
    import cv2

    model, variables = load_model(args.ckpt, args.model, args.flow_iters)
    run = _interp_fn(model, variables)
    lp = _lpips_fn(args.lpips_path)
    ds = 0.5 if args.split == "2k" else 0.25
    if args.save_preds:
        os.makedirs(args.save_preds, exist_ok=True)

    psnrs, lpips_vals = [], []
    for idx, (p0, p1, pt, t) in enumerate(_x4k_items(args.data_root)):
        i0, i1, gt = (read_image(p) for p in (p0, p1, pt))
        if args.split == "2k":
            i0, i1, gt = (
                cv2.resize(x, (2048, 1080), interpolation=cv2.INTER_AREA)
                for x in (i0, i1, gt)
            )
        padder = InputPadder(i0.shape, 32, bucket=args.bucket)
        xs = jnp.stack(padder.pad(jnp.asarray(i0[None]), jnp.asarray(i1[None])), 1)
        out = run(xs, [float(t)], ds)
        pred = np.asarray(padder.unpad(out["imgt_pred"][0]))[0]
        psnrs.append(compute_psnr_np(pred, gt))
        if lp is not None:
            lpips_vals.append(lp(gt, pred))
        if args.save_preds:
            cv2.imwrite(
                os.path.join(args.save_preds, f"{idx:05d}.png"),
                (np.clip(pred, 0, 1) * 255).astype(np.uint8)[:, :, ::-1],
            )
    res = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "lpips": float(np.mean(lpips_vals)) if lpips_vals else None,
    }
    print(f"X4K {args.split}: {res} over {len(psnrs)} frames")
    return res


# ------------------------------------------------------------------- VTF/VSF
def run_vtf(args):
    """Stage-1 motion benchmark on Vimeo-Triplet-Flow: flow PSNR (normalized)
    + EPE at t=0.5 (`VTF.py:93-159`)."""
    model = GIMM()
    from ..utils.convert import convert_gimm, load_torch_state_dict

    sd = load_torch_state_dict(args.ckpt)
    params, _ = convert_gimm(sd)
    variables = {"params": params}

    @jax.jit
    def run(xs, ori, t):
        return model.apply(variables, xs, ori, t)

    with open(os.path.join(args.data_root, "tri_testlist.txt")) as f:
        seqs = [x for x in f.read().splitlines() if x.strip()]

    psnrs, epes = [], []
    for seq in seqs:
        d = os.path.join(args.data_root, "flow_sequences", seq)
        if not os.path.isdir(d):
            continue
        f01 = read_flo(os.path.join(d, "im1_im3.flo"))
        fmid = read_flo(os.path.join(d, "im2_im3.flo")) - read_flo(
            os.path.join(d, "im2_im1.flo")
        )
        f10 = -read_flo(os.path.join(d, "im3_im1.flo"))
        scaler = max(np.abs(f01).max(), np.abs(f10).max())
        nf = lambda f: (f / scaler + 1.0) / 2.0
        xs = jnp.asarray(np.stack([nf(f01), nf(f10)])[None], jnp.float32)
        ori = jnp.asarray(np.stack([f01, -f10])[None], jnp.float32)
        pred = np.asarray(run(xs, ori, jnp.asarray([0.5], jnp.float32)))[0, 0]
        target = nf(fmid)
        mse = float(((pred - target) ** 2).mean())
        psnrs.append(-10 * np.log10(max(mse, 1e-12)))
        pred_flow = (pred * 2 - 1) * scaler
        epes.append(float(np.linalg.norm(pred_flow - fmid, axis=-1).mean()))
    print(f"VTF: flow PSNR {np.mean(psnrs):.3f}, EPE {np.mean(epes):.3f}")
    return {"psnr": float(np.mean(psnrs)), "epe": float(np.mean(epes))}


def run_vsf(args):
    """Stage-1 motion benchmark on Vimeo-Septuplet-Flow: flow PSNR
    (normalized) + EPE at frames t_id=2..6 (`VSF.py:66-168`).

    Replicates the reference exactly, including its off-by-one: the INR
    coordinate time channel is (t_id-1)/6 while the splat timestep is t_id/6
    (`VSF.py:126-150`)."""
    model = GIMM()
    from ..utils.convert import convert_gimm, load_torch_state_dict

    sd = load_torch_state_dict(args.ckpt)
    params, _ = convert_gimm(sd)
    variables = {"params": params}

    from ..ops.coords import sample_coords_3d

    @jax.jit
    def run(xs, ori, t_splat, coord):
        return model.apply(variables, xs, ori, t_splat, coord=coord)

    with open(os.path.join(args.data_root, "sep_testlist.txt")) as f:
        seqs = [x for x in f.read().splitlines() if x.strip()]

    psnrs, epes = [], []
    for seq in seqs:
        d = os.path.join(args.data_root, "flow_sequences", seq)
        if not os.path.isdir(d):
            continue
        f01 = read_flo(os.path.join(d, "im1_im7.flo"))
        f10 = read_flo(os.path.join(d, "im7_im1.flo"))
        h, w = f01.shape[:2]
        for t_id in range(2, 7):
            gt = read_flo(os.path.join(d, f"im{t_id}_im7.flo")) - read_flo(
                os.path.join(d, f"im{t_id}_im1.flo")
            )
            xs_raw = np.stack([f01, -f10])[None]  # (1, 2, H, W, 2)
            scaler = float(np.abs(xs_raw).max())
            nf = lambda f: (f / scaler + 1.0) / 2.0
            xs = jnp.asarray(nf(xs_raw), jnp.float32)
            ori = jnp.asarray(np.stack([f01, f10])[None], jnp.float32)
            coord = sample_coords_3d(1, (h, w), jnp.asarray([(t_id - 1) / 6.0]))
            pred = np.asarray(
                run(xs, ori, jnp.asarray([t_id / 6.0], jnp.float32), coord)
            )[0, 0]
            target = nf(gt)
            mse = float(((pred - target) ** 2).mean())
            psnrs.append(-10 * np.log10(max(mse, 1e-12)))
            pred_flow = (pred * 2 - 1) * scaler
            epes.append(float(np.linalg.norm(pred_flow - gt, axis=-1).mean()))
    print(f"VSF: flow PSNR {np.mean(psnrs):.3f}, EPE {np.mean(epes):.3f}")
    return {"psnr": float(np.mean(psnrs)), "epe": float(np.mean(epes))}


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="bench", required=True)
    for name in ("snu_film_arb", "x4k", "vtf", "vsf"):
        sp = sub.add_parser(name)
        sp.add_argument("--data-root", required=True)
        sp.add_argument("--ckpt", required=True)
        sp.add_argument("--ds-factor", type=float, default=1.0)
        sp.add_argument("--lpips-path", default=None)
        sp.add_argument(
            "--model", default="gimmvfi_r", choices=["gimmvfi_r", "gimmvfi_f"]
        )
        sp.add_argument("--flow-iters", type=int, default=None)
        sp.add_argument(
            "--bucket", type=int, default=None,
            help="round padded sizes up to a multiple of this (one XLA "
            "compile per size bucket on mixed-size sets; e.g. 128)",
        )
        if name == "x4k":
            sp.add_argument("--split", choices=("2k", "4k"), default="2k")
            sp.add_argument("--save-preds", default=None)
    args = p.parse_args(argv)
    fn = {
        "snu_film_arb": run_snu_film_arb,
        "x4k": run_x4k,
        "vtf": run_vtf,
        "vsf": run_vsf,
    }[args.bench]
    res = fn(args)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
