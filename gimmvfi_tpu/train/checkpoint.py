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


def restore_checkpoint(ckpt_dir: str, abstract_state: Any, step: Optional[int] = None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    mgr = ocp.CheckpointManager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
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
