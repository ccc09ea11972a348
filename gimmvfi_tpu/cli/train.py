"""Training driver (reference `src/main.py` + `src/trainers/`).

Two-stage recipe:
  stage 1 (GIMM):     python -m gimmvfi_tpu.cli.train --config configs/gimm.yaml
  stage 2 (GIMM-VFI): python -m gimmvfi_tpu.cli.train --config configs/gimmvfi_r_arb.yaml \
      --load-path runs/gimm/ckpt  (partial load of stage-1 weights)

Data parallel over all local devices via a `data` mesh; params replicated,
batches sharded; XLA handles the gradient all-reduce.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, create_dataset
from ..models import create_model
from ..parallel import create_mesh, replicate, shard_batch
from ..train import (
    create_optimizer,
    create_train_state,
    make_gimm_eval_step,
    make_gimm_train_step,
    make_gimmvfi_eval_step,
    make_gimmvfi_train_step,
    warmup_cosine_schedule,
)
from ..train.checkpoint import merge_partial, restore_checkpoint, save_checkpoint
from ..utils.config import load_config, save_config
from ..utils.metrics import MetricAccumulator

logger = logging.getLogger("gimmvfi_tpu.train")


def setup_run_dir(
    result_path: str, cfg, resume: bool = False, is_host0: bool = True,
    stamp: str | None = None,
) -> str:
    """Create a timestamped run dir — or reuse `result_path` itself when
    resuming (the reference reloads config.yaml from the result dir,
    `utils/setup.py:65-67`; round-1 bug: resume pointed at a fresh empty dir).

    Only host 0 writes the config snapshot, the src tree copy, and the file
    log (the reference logs on rank 0 only, `utils/setup.py:25-44`); every
    host still returns the same run_dir so collective orbax saves agree."""
    if resume:
        run_dir = result_path
        if not os.path.isdir(os.path.join(run_dir, "ckpt")):
            raise FileNotFoundError(
                f"--resume expects an existing run dir with a ckpt/: {run_dir}"
            )
    else:
        run_dir = os.path.join(
            result_path, stamp or time.strftime("%d%m%Y_%H%M%S")
        )
        os.makedirs(run_dir, exist_ok=True)
        if is_host0:
            save_config(cfg, os.path.join(run_dir, "config.yaml"))
            # snapshot the source tree (`utils/setup.py:94-98`)
            import shutil

            src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            try:
                shutil.copytree(
                    src,
                    os.path.join(run_dir, "src_snapshot", "gimmvfi_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__"),
                )
            except OSError:
                pass
    handlers = [logging.StreamHandler()]
    if is_host0:
        handlers.insert(0, logging.FileHandler(os.path.join(run_dir, "train.log")))
    logging.basicConfig(
        level=logging.INFO if is_host0 else logging.WARNING,
        handlers=handlers,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        force=True,
    )
    return run_dir


def param_count(tree) -> int:
    """Parameter count logging (reference `utils/profiler.py:12-41`)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _subsample_indices(rng: np.random.Generator, batch: int, hw: int, ratio: float):
    k = int(hw * ratio)
    return np.stack(
        [rng.permutation(hw)[:k] for _ in range(batch)], axis=0
    ).astype(np.int32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--result-path", default="runs")
    p.add_argument("--load-path", default=None, help="partial init (stage-1 ckpt)")
    p.add_argument(
        "--resume",
        action="store_true",
        help="resume: --result-path must be an EXISTING run dir with ckpt/",
    )
    p.add_argument("--overrides", nargs="*", default=[])
    p.add_argument("--smoke-test", action="store_true")
    p.add_argument(
        "--eval",
        action="store_true",
        help="eval-only: validate the loaded weights (use with --load-path "
        "or --resume) and exit — the reference's `main.py -e` mode",
    )
    p.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: jax.distributed.initialize() before touching devices "
        "(single-host data parallelism needs no flag — the mesh spans all "
        "local devices)",
    )
    p.add_argument(
        "--lpips-path",
        default=None,
        help="LPIPS weights (.pt with lpips layout) to enable the perceptual "
        "loss from the -P recipes",
    )
    args = p.parse_args(argv)

    if args.distributed:
        # DCN rendezvous; the reference's NCCL env:// init (`dist.py:31-46`)
        jax.distributed.initialize()

    config_path = args.config
    if args.resume:
        # reload the exact config the run was started with
        saved = os.path.join(args.result_path, "config.yaml")
        if os.path.exists(saved):
            config_path = saved
    cfg = load_config(config_path, args.overrides)
    is_host0 = jax.process_index() == 0
    # all hosts must agree on the timestamped run-dir name (collective orbax
    # saves target one path); broadcast host 0's clock when multi-host
    stamp = time.strftime("%d%m%Y_%H%M%S")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        sec = multihost_utils.broadcast_one_to_all(np.int64(time.time()))
        # gmtime, not localtime: hosts with different TZ env would otherwise
        # format the same broadcast second into different run-dir names
        stamp = time.strftime("%d%m%Y_%H%M%S", time.gmtime(int(sec)))
    run_dir = setup_run_dir(
        args.result_path, cfg, resume=args.resume, is_host0=is_host0, stamp=stamp
    )
    seed = cfg.experiment.seed
    np_rng = np.random.default_rng(seed)

    from ..utils.writer import NullWriter, Writer, reconstruction_grid

    writer = Writer(run_dir) if is_host0 else NullWriter()

    mesh = create_mesh()
    n_dev = mesh.devices.size
    local_batch = cfg.experiment.batch_size
    global_batch = local_batch * n_dev
    # each host loads its share of the global batch
    host_batch = global_batch // jax.process_count()
    logger.info(
        "mesh: %d devices / %d hosts, global batch %d",
        n_dev, jax.process_count(), global_batch,
    )

    ds_kw = {"aug": getattr(cfg.dataset, "aug", True)}
    if getattr(cfg.dataset, "crop_size", None):
        ds_kw["crop_size"] = tuple(cfg.dataset.crop_size)
    trn, val = create_dataset(cfg.dataset.type, cfg.dataset.path, **ds_kw)
    if args.smoke_test:
        trn.meta_data = trn.meta_data[: 2 * global_batch]
        val.meta_data = val.meta_data[: 2 * global_batch]
    # per-host input sharding: each host loads only its slice of the global
    # batch (the DistributedSampler equivalent, `trainer.py:49-55`)
    loader = DataLoader(
        trn, host_batch, seed=seed,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    val_loader = DataLoader(
        val, host_batch, seed=seed, shuffle=False,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )

    arch = cfg.arch.type.lower()
    is_stage2 = arch.startswith("gimmvfi")
    if arch == "gimmvfi_r":
        model = create_model(arch, raft_iters=cfg.arch.raft_iter)
    elif arch == "gimm":
        # stage-1 recipe (bs 32, 256^2) needs block remat to fit 16 GB HBM;
        # forward-bit-exact and same param tree (tests/test_remat_toggle.py)
        model = create_model(arch, remat=True)
    else:
        model = create_model(arch)

    # init params
    rng = jax.random.PRNGKey(seed)
    if is_stage2:
        dummy = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        variables = model.init(rng, dummy, (0.5,))
    else:
        dummy_xs = jnp.zeros((1, 2, 64, 64, 2), jnp.float32)
        variables = model.init(
            rng, dummy_xs, dummy_xs, jnp.zeros((1,), jnp.float32)
        )
    variables = dict(variables)
    variables.setdefault("batch_stats", {})

    if args.load_path:
        from ..utils.convert import (
            convert_gimm,
            convert_gimmvfi_f,
            convert_gimmvfi_r,
            load_torch_state_dict,
        )

        if args.load_path.endswith((".pt", ".pth")):
            sd = load_torch_state_dict(args.load_path)
            if "flow_estimator.fnet.conv1.weight" in sd:
                conv = convert_gimmvfi_r
            elif "flow_estimator.memory_decoder.proj.weight" in sd:
                conv = convert_gimmvfi_f
            else:
                conv = convert_gimm
            lp, ls = conv(sd)
            variables["params"] = merge_partial(variables["params"], lp)
            variables["batch_stats"] = merge_partial(variables["batch_stats"], ls)
        else:
            loaded, _ = restore_checkpoint(args.load_path, None)
            from ..train.checkpoint import relocate_mask_head

            variables["params"] = merge_partial(
                variables["params"], relocate_mask_head(loaded["params"])
            )
        logger.info("partially loaded weights from %s", args.load_path)

    # total_batch_size -> grad-accum derivation (`src/utils/config.py:92-105`);
    # the reference only uses it to scale scheduler steps — the train loop
    # steps every iteration — replicated here exactly.
    total_bs = cfg.experiment.total_batch_size or global_batch
    if total_bs % global_batch != 0:
        raise ValueError(
            f"total_batch_size {total_bs} not divisible by batch_size x "
            f"devices = {global_batch}"
        )
    grad_accm_steps = max(1, total_bs // global_batch)
    if grad_accm_steps > 1:
        logger.info("grad_accm_steps=%d (scheduler steps scaled)", grad_accm_steps)

    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * cfg.experiment.epochs // grad_accm_steps
    w = cfg.optimizer.warmup
    schedule = warmup_cosine_schedule(
        cfg.optimizer.init_lr,
        w.min_lr,
        total_steps,
        warmup_steps=w.epoch * steps_per_epoch // grad_accm_steps,
        buffer_steps=w.buffer_epoch * steps_per_epoch // grad_accm_steps,
        multiplier=w.multiplier,
        mode=w.mode,
        world_size=n_dev,
        start_from_zero=w.start_from_zero,
    )
    tx = create_optimizer(
        variables["params"],
        opt_type=cfg.optimizer.type,
        init_lr=cfg.optimizer.init_lr,
        weight_decay=cfg.optimizer.weight_decay,
        betas=tuple(cfg.optimizer.betas),
        ft=cfg.optimizer.ft,
        lr_schedule=schedule,
        max_grad_norm=cfg.optimizer.max_gn,
    )

    use_ema = bool(cfg.arch.ema)
    state = create_train_state(variables, tx, use_ema=use_ema)
    logger.info(
        "#params: %.2fM (%s)", param_count(variables["params"]) / 1e6, arch
    )

    lpips_fn = None
    if is_stage2 and cfg.loss.perceptual_loss and args.lpips_path:
        from ..train.lpips import LPIPS
        from ..utils.convert import convert_lpips, load_torch_state_dict

        lp_params, _ = convert_lpips(load_torch_state_dict(args.lpips_path))
        lpips_model = LPIPS()

        def lpips_fn(pred, gt):
            return lpips_model.apply(
                {"params": lp_params}, pred, gt, normalize=True
            )

        logger.info("perceptual (LPIPS) loss enabled from %s", args.lpips_path)

    if is_stage2:
        step_fn = make_gimmvfi_train_step(
            model, tx, rec_weight=cfg.arch.rec_weight, lpips_fn=lpips_fn,
            use_ema=use_ema,
        )
        eval_fn = jax.jit(make_gimmvfi_eval_step(model, cfg.arch.rec_weight))

        def _viz(p, s, b):
            return model.apply(
                {"params": p, "batch_stats": s},
                jnp.stack([b["img0"], b["img1"]], axis=1),
                b["t"],
                b["sub_idx0"],
                b["sub_idx1"],
                method=model.train_forward,
                train=False,
            )

        viz_fn = jax.jit(_viz)
    else:
        step_fn = make_gimm_train_step(model, tx, use_ema=use_ema)
        eval_fn = jax.jit(make_gimm_eval_step(model))
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    epoch_st = 0
    if args.resume:
        state, last = restore_checkpoint(os.path.join(run_dir, "ckpt"), state)
        epoch_st = last // steps_per_epoch
        logger.info("resumed from step %d (epoch %d)", last, epoch_st)

    def run_validation(state, epoch):
        """Model + EMA validation pass (`trainers/trainer.py:94-130`)."""
        eval_sets = [("valid", state.params, state.batch_stats)]
        if use_ema and state.ema is not None:
            eval_sets.append(
                ("valid_ema", state.ema["params"], state.ema["batch_stats"])
            )
        for tag, ev_params, ev_stats in eval_sets:
            vaccm = MetricAccumulator(
                ("loss_total", "rec", "psnr")
                if is_stage2
                else ("loss_total", "mse", "psnr")
            )
            for batch in val_loader:
                if is_stage2:
                    nb = batch["img0"].shape[0]
                    hw = batch["img0"].shape[1] * batch["img0"].shape[2]
                    batch["sub_idx0"] = _subsample_indices(
                        np_rng, nb, hw, cfg.loss.subsample.ratio
                    )
                    batch["sub_idx1"] = _subsample_indices(
                        np_rng, nb, hw, cfg.loss.subsample.ratio
                    )
                    batch = shard_batch(mesh, batch)
                    m = eval_fn(ev_params, ev_stats, batch)
                else:
                    batch = shard_batch(mesh, batch)
                    m = eval_fn(ev_params, batch)
                vaccm.update(jax.device_get(m))
            logger.info("epoch %d [%s]: %s", epoch, tag, vaccm.print_line())
            writer.add_scalars(vaccm.summary(), tag, epoch)

    if args.eval:
        # eval-only mode (`main.py -e`): validate the loaded weights and exit
        with mesh:
            state = replicate(mesh, state)
            run_validation(state, epoch_st)
        writer.close()
        return

    with mesh:
        state = replicate(mesh, state)
        metric_names = (
            ("loss_total", "lap", "census", "l1", "rec", "lpips", "psnr")
            if is_stage2
            else ("loss_total", "mse", "psnr")
        )
        for epoch in range(epoch_st, cfg.experiment.epochs):
            loader.set_epoch(epoch)
            accm = MetricAccumulator(metric_names)
            t0 = time.time()
            for it, batch in enumerate(loader):
                nb = batch["img0" if is_stage2 else "xs"].shape[0]
                if is_stage2:
                    hw = batch["img0"].shape[1] * batch["img0"].shape[2]
                    batch["sub_idx0"] = _subsample_indices(
                        np_rng, nb, hw, cfg.loss.subsample.ratio
                    )
                    batch["sub_idx1"] = _subsample_indices(
                        np_rng, nb, hw, cfg.loss.subsample.ratio
                    )
                else:
                    # one shared t_id per iteration, broadcast over the batch
                    # (reference `trainer_gimm.py:125-132` draws a single
                    # scalar t per step; the step fn itself accepts per-sample
                    # t_ids, so this is purely a sampling-distribution match)
                    batch["t_id"] = np.full(
                        (nb,), np_rng.integers(0, 3), np.int32
                    )
                batch = shard_batch(mesh, batch)
                state, metrics = step_fn(state, batch)
                accm.update(jax.device_get(metrics))
            logger.info(
                "epoch %d: %s (%.1fs)", epoch, accm.print_line(), time.time() - t0
            )
            writer.add_scalars(accm.summary(), "train", epoch)

            # validation + EMA validation every test_freq epochs
            # (reference `trainers/trainer.py:94-130`)
            last_epoch = epoch == cfg.experiment.epochs - 1
            if (epoch + 1) % cfg.experiment.test_freq == 0 or last_epoch:
                run_validation(state, epoch)

            # reconstruction grid every test_imlog_freq epochs
            # (`trainer_gimmvfi.py:384-421`)
            if is_stage2 and (epoch + 1) % cfg.experiment.test_imlog_freq == 0:
                batch = next(iter(val_loader))
                nb = batch["img0"].shape[0]
                hw = batch["img0"].shape[1] * batch["img0"].shape[2]
                batch["sub_idx0"] = _subsample_indices(
                    np_rng, nb, hw, cfg.loss.subsample.ratio
                )
                batch["sub_idx1"] = _subsample_indices(
                    np_rng, nb, hw, cfg.loss.subsample.ratio
                )
                sharded = shard_batch(mesh, batch)
                out = viz_fn(state.params, state.batch_stats, sharded)
                out = jax.device_get(out)
                grid = reconstruction_grid(
                    batch["img0"], out["imgt_pred"], batch["gt"], batch["img1"],
                    out["flowt"] * -0.5, out["flowt"] * 0.5,
                )
                writer.add_image("reconstruction", grid, "valid", epoch)

            if (epoch + 1) % cfg.experiment.save_ckpt_freq == 0 or last_epoch:
                save_checkpoint(
                    os.path.join(run_dir, "ckpt"),
                    int(jax.device_get(state.step)),
                    jax.device_get(state),
                )
    writer.close()
    logger.info("training done: %s", run_dir)


if __name__ == "__main__":
    main()
