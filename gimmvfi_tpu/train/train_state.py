"""Training state + jitted stage-1/stage-2 train steps.

Rebuilds the reference train loops (`trainer_gimm.py:103-161`,
`trainer_gimmvfi.py:184-337`) as pure jitted step functions over an explicit
state pytree. Under a `data` mesh with replicated params and batch-sharded
inputs, XLA inserts the gradient all-reduce — the DDP equivalent.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from . import losses
from .ema import ema_init, ema_update


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[Any]  # {"params":..., "batch_stats":...} or None


def create_train_state(variables, tx, use_ema: bool = True) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema_init({"params": params, "batch_stats": batch_stats})
        if use_ema
        else None,
    )


def make_gimmvfi_train_step(
    model,
    tx,
    rec_weight: float = 0.1,
    lpips_fn: Optional[Callable] = None,
    use_ema: bool = True,
):
    """Stage-2 step. batch: img0/img1/gt (N,H,W,3), t (N,),
    sub_idx0/sub_idx1 (N, K) int32.

    Loss = lap + census + charbonnier (+ lpips) on imgt_pred and 0.5x on the
    aux img_warp_4, + rec_weight * flow-reconstruction MSE
    (`trainer_gimmvfi.py:259-327`).
    """

    def loss_fn(params, batch_stats, batch):
        img_xs = jnp.stack([batch["img0"], batch["img1"]], axis=1)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img_xs,
            batch["t"],
            batch["sub_idx0"],
            batch["sub_idx1"],
            method=model.train_forward,
            mutable=["batch_stats"],
        )
        gt = batch["gt"]

        pred = out["imgt_pred"]
        aux = out["img_warp_4"]
        loss_lap = losses.lap_loss(pred, gt) + 0.5 * losses.lap_loss(aux, gt)
        loss_census = losses.census_loss(pred, gt) + 0.5 * losses.census_loss(aux, gt)
        loss_l1 = losses.charbonnier_l1(pred, gt) + 0.5 * losses.charbonnier_l1(aux, gt)
        loss_lpips = 0.0
        if lpips_fn is not None:
            loss_lpips = lpips_fn(pred, gt).mean() + 0.5 * lpips_fn(aux, gt).mean()

        # flow reconstruction on subsampled coords (`trainer_gimmvfi.py:306-319`)
        nflow = jax.lax.stop_gradient(out["nflow"])  # (N, 2, H, W, 2)
        n = nflow.shape[0]

        def sub_target(time_idx, sub_idx):
            flat = nflow[:, time_idx].reshape(n, -1, 2)
            return jnp.take_along_axis(flat, sub_idx[..., None], axis=1)

        inr0, inr1 = out["ninrflow"]
        loss_rec = 0.5 * jnp.mean(
            (inr0 - sub_target(0, batch["sub_idx0"])) ** 2
        ) + 0.5 * jnp.mean((inr1 - sub_target(1, batch["sub_idx1"])) ** 2)

        total = loss_census + loss_l1 + rec_weight * loss_rec + loss_lap + loss_lpips
        metrics = {
            "loss_total": total,
            "lap": loss_lap,
            "census": loss_census,
            "l1": loss_l1,
            "rec": loss_rec,
            "lpips": loss_lpips,
            "psnr": losses.psnr(pred, gt),
        }
        return total, (mut["batch_stats"], metrics)

    def train_step(state: TrainState, batch):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if use_ema and ema is not None:
            ema = ema_update(
                ema, {"params": params, "batch_stats": new_stats}, state.step
            )
        return (
            TrainState(state.step + 1, params, new_stats, opt_state, ema),
            metrics,
        )

    return train_step


def make_gimmvfi_eval_step(model, rec_weight: float = 0.1):
    """Validation step (`trainers/trainer.py:94-130` eval every test_freq;
    `trainer_gimmvfi.py` valid mode): same losses without grad, BN running
    stats. batch like the train step. Works for the raw params or the EMA
    copy (pass ema["params"]/ema["batch_stats"])."""

    def eval_step(params, batch_stats, batch):
        img_xs = jnp.stack([batch["img0"], batch["img1"]], axis=1)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img_xs,
            batch["t"],
            batch["sub_idx0"],
            batch["sub_idx1"],
            method=model.train_forward,
            train=False,
        )
        gt = batch["gt"]
        pred = out["imgt_pred"]
        nflow = out["nflow"]
        n = nflow.shape[0]

        def sub_target(time_idx, sub_idx):
            flat = nflow[:, time_idx].reshape(n, -1, 2)
            return jnp.take_along_axis(flat, sub_idx[..., None], axis=1)

        inr0, inr1 = out["ninrflow"]
        loss_rec = 0.5 * jnp.mean(
            (inr0 - sub_target(0, batch["sub_idx0"])) ** 2
        ) + 0.5 * jnp.mean((inr1 - sub_target(1, batch["sub_idx1"])) ** 2)
        return {
            "loss_total": losses.charbonnier_l1(pred, gt)
            + losses.census_loss(pred, gt)
            + losses.lap_loss(pred, gt)
            + rec_weight * loss_rec,
            "rec": loss_rec,
            "psnr": losses.psnr(pred, gt),
        }

    return eval_step


def make_gimm_eval_step(model):
    """Stage-1 validation at t=0.5 (`trainer_gimm.py` eval path)."""

    def eval_step(params, batch):
        t = jnp.full((batch["xs"].shape[0],), 0.5, jnp.float32)
        pred = model.apply(
            {"params": params}, batch["xs"][:, [0, 2]], batch["ori_flows"], t
        )
        target = batch["xs"][:, 1:2]
        n = pred.shape[0]
        mse = ((pred - target) ** 2).reshape(n, -1).mean(axis=-1)
        return {
            "loss_total": mse.mean(),
            "mse": mse.mean(),
            "psnr": (-10 * jnp.log10(mse)).mean(),
        }

    return eval_step


def make_gimm_train_step(model, tx, use_ema: bool = False):
    """Stage-1 step (`trainer_gimm.py:103-161`): MSE on normalized flow at a
    random t in {0, 0.5, 1}. batch: xs (N,3,H,W,2) [f0, f_mid, f1],
    ori_flows (N,2,H,W,2), t_id (N,) in {0,1,2}."""

    def loss_fn(params, batch):
        t = batch["t_id"].astype(jnp.float32) / 2.0
        xs_pair = batch["xs"][:, [0, 2]]  # endpoint flows as encoder input
        pred = model.apply(
            {"params": params},
            xs_pair,
            batch["ori_flows"],
            t,
        )  # (N, 1, H, W, 2)
        # target = the flow at t: index xs by t_id
        n = pred.shape[0]
        target = jnp.take_along_axis(
            batch["xs"], batch["t_id"].reshape(n, 1, 1, 1, 1), axis=1
        )
        mse = ((pred - target) ** 2).reshape(n, -1).mean(axis=-1)
        metrics = {
            "loss_total": mse.mean(),
            "mse": mse.mean(),
            "psnr": (-10 * jnp.log10(mse)).mean(),
        }
        return mse.mean(), metrics

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if use_ema and ema is not None:
            ema = ema_update(
                ema,
                {"params": params, "batch_stats": state.batch_stats},
                state.step,
            )
        return (
            TrainState(state.step + 1, params, state.batch_stats, opt_state, ema),
            metrics,
        )

    return train_step
