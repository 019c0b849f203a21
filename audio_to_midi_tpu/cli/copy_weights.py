"""Architecture-migration tool (reference copy_weights.py): load an old
checkpoint, build a model with the current config, greedily copy
shape-and-dtype-matching leaves in flattened order, save as a step-0
checkpoint with the new metadata."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def copy_matching_leaves(old_params, new_params) -> tuple[object, int, int]:
    """Greedy in-order copy of shape/dtype-matching leaves.

    Mirrors reference copy_weights.py:48-58: walk both flattened leaf lists in
    order; at each new leaf, consume old leaves until one matches.
    Returns (merged params, copied count, fresh count).
    """
    old_leaves = jax.tree.leaves(old_params)
    new_leaves, treedef = jax.tree.flatten(new_params)

    merged = []
    copied = 0
    old_idx = 0
    for leaf in new_leaves:
        found = None
        for j in range(old_idx, len(old_leaves)):
            cand = old_leaves[j]
            if (
                hasattr(cand, "shape")
                and tuple(cand.shape) == tuple(leaf.shape)
                and cand.dtype == leaf.dtype
            ):
                found = j
                break
        if found is not None:
            merged.append(np.asarray(old_leaves[found]))
            old_idx = found + 1
            copied += 1
        else:
            merged.append(np.asarray(leaf))
    return treedef.unflatten(merged), copied, len(new_leaves) - copied


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Copy weights from an old checkpoint into the current architecture."
    )
    parser.add_argument("source", help="Source checkpoint directory")
    parser.add_argument("dest", help="Destination checkpoint directory")
    parser.add_argument("--ensemble-size", type=int, default=1)
    args = parser.parse_args(argv)

    from ..config import DEFAULT_CONFIG
    from ..models import model as model_lib
    from ..train import checkpoint as ckpt

    cfg = DEFAULT_CONFIG
    old_params, step = ckpt.restore_raw(args.source)
    print(f"Loaded source checkpoint at step {step}")

    new_params, state = model_lib.init_ensemble(
        jax.random.PRNGKey(0), cfg.model, args.ensemble_size
    )
    merged, copied, fresh = copy_matching_leaves(old_params, new_params)
    print(f"Copied {copied} leaves, kept {fresh} freshly-initialized leaves")

    import orbax.checkpoint as ocp

    manager = ckpt.create_checkpoint_manager(
        Path(args.dest), cfg, save_interval_steps=1
    )
    manager.save(
        0,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(merged),
            state=ocp.args.StandardSave(state if state else {"_empty": 0}),
        ),
    )
    manager.wait_until_finished()
    print(f"Saved migrated checkpoint (step 0) to {args.dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
