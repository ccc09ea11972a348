"""Restore-time migration of pre-hoist checkpoints.

The convex-upsample mask head moved from inside the scanned update block
(`refine/update_block/mask_*`, `step/update_block/mask_*`) to a sibling
`mask_head/` module; orbax checkpoints written before that refactor must
still restore (advisor r4, medium).
"""

import numpy as np

from gimmvfi_tpu.train.checkpoint import (
    relocate_mask_head,
    restore_checkpoint,
    save_checkpoint,
)


def _old_raft_params():
    return {
        "flow_estimator": {
            "refine": {
                "update_block": {
                    "mask_0": {"kernel": np.zeros((3, 3, 128, 256))},
                    "mask_2": {"kernel": np.zeros((1, 1, 256, 576))},
                    "gru": {"kernel": np.ones((1, 5, 384, 128))},
                }
            },
            "fnet": {"conv1": {"kernel": np.ones((7, 7, 3, 64))}},
        }
    }


def _new_raft_params():
    return {
        "flow_estimator": {
            "refine": {
                "update_block": {"gru": {"kernel": np.ones((1, 5, 384, 128))}}
            },
            "mask_head": {
                "mask_0": {"kernel": np.zeros((3, 3, 128, 256))},
                "mask_2": {"kernel": np.zeros((1, 1, 256, 576))},
            },
            "fnet": {"conv1": {"kernel": np.ones((7, 7, 3, 64))}},
        }
    }


def test_relocate_raft_and_flowformer_layouts():
    import jax

    moved = relocate_mask_head(_old_raft_params())
    assert jax.tree_util.tree_structure(moved) == jax.tree_util.tree_structure(
        _new_raft_params()
    )

    old_ff = {
        "memory_decoder": {
            "step": {
                "update_block": {
                    "mask_0": {"kernel": np.zeros((3,))},
                    "mask_2": {"kernel": np.zeros((3,))},
                    "flow_head": {"kernel": np.zeros((3,))},
                }
            }
        }
    }
    moved = relocate_mask_head(old_ff)
    md = moved["memory_decoder"]
    assert set(md) == {"step", "mask_head"}
    assert set(md["step"]["update_block"]) == {"flow_head"}
    assert set(md["mask_head"]) == {"mask_0", "mask_2"}


def test_relocate_is_noop_on_new_layout():
    import jax

    new = _new_raft_params()
    assert jax.tree_util.tree_structure(
        relocate_mask_head(new)
    ) == jax.tree_util.tree_structure(new)


def test_restore_migrates_old_checkpoint(tmp_path):
    # optimizer moments carry param-tree copies: they must migrate too
    old_state = {
        "params": _old_raft_params(),
        "opt": {"mu": _old_raft_params(), "nu": _old_raft_params()},
        "step": np.int64(7),
    }
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, 7, old_state)

    abstract = {
        "params": _new_raft_params(),
        "opt": {"mu": _new_raft_params(), "nu": _new_raft_params()},
        "step": np.int64(0),
    }
    restored, step = restore_checkpoint(ckpt, abstract)
    assert step == 7
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(
        restored["params"]["flow_estimator"]["mask_head"]["mask_2"]["kernel"],
        np.zeros((1, 1, 256, 576)),
    )
    np.testing.assert_array_equal(
        restored["opt"]["nu"]["flow_estimator"]["refine"]["update_block"]["gru"][
            "kernel"
        ],
        np.ones((1, 5, 384, 128)),
    )
