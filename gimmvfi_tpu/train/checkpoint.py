"""Orbax checkpointing with the reference's three-part layout.

Rebuilds `trainers/trainer.py:132-143` + `main.py:106-156`: checkpoints carry
{step/epoch, model variables, optimizer state, EMA variables}; resume
restores all of them, and partial loads (stage-1 GIMM weights into stage-2
GIMM-VFI, strict=False) merge by matching subtree paths.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = 3):
    ckpt_dir = os.path.abspath(ckpt_dir)
    mgr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    )
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def relocate_mask_head(tree: Any) -> Any:
    """Migrate pre-hoist checkpoints: the convex-upsample mask head used to
    live INSIDE the scanned update block (`refine/update_block/mask_*` for
    RAFT, `step/update_block/mask_*` for FlowFormer); it now runs once on the
    final hidden state as a sibling `mask_head/` module (`flow/raft.py`
    UpsampleMaskHead, `flow/flowformer.py` FFMaskHead). Applied recursively,
    so optimizer-moment and EMA copies of the param tree migrate too."""
    if not isinstance(tree, dict):
        return tree
    out = {k: relocate_mask_head(v) for k, v in tree.items()}
    for loop_key in ("refine", "step"):
        loop = out.get(loop_key)
        if not (
            isinstance(loop, dict) and isinstance(loop.get("update_block"), dict)
        ):
            continue
        ub = dict(loop["update_block"])
        if "mask_0" in ub and "mask_2" in ub and "mask_head" not in out:
            out["mask_head"] = {"mask_0": ub.pop("mask_0"), "mask_2": ub.pop("mask_2")}
            out[loop_key] = {**loop, "update_block": ub}
    return out


def restore_checkpoint(ckpt_dir: str, abstract_state: Any, step: Optional[int] = None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    except Exception:
        # tree-structure mismatch: try the mask-head relocation shim on the
        # raw stored pytree, then re-validate against the abstract state
        raw = mgr.restore(step)
        migrated = relocate_mask_head(raw)
        want = jax.tree_util.tree_structure(abstract_state)
        got = jax.tree_util.tree_structure(migrated)
        if want != got:
            mgr.close()
            raise
        restored = migrated
    mgr.close()
    return restored, step


def merge_partial(params: Any, loaded: Any) -> Any:
    """strict=False load: overwrite matching subtrees, keep the rest
    (`main.py:106-117` stage-1 -> stage-2 transfer)."""

    def merge(dst: dict, src: dict):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge(out[k], v)
            elif k in out:
                out[k] = v
        return out

    return merge(params, loaded)
