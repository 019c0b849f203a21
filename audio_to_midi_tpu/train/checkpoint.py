"""Orbax checkpointing with config metadata.

Reference semantics (train.py:799-831, infer.py:172-236): a CheckpointManager
with composite items ('params', 'state'), max_to_keep=3, save every 20 steps,
full model+data-prep config stored as manager metadata for drift detection,
async saves with a final wait, restore-latest with a metadata mismatch
warning, and ``latest_step() + 1`` resume.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..config import Config


def score_by_checkpoint_metrics(metrics: dict) -> float:
    """Mean of the metric values — the reference's (commented) best_fn for
    CheckpointManagerOptions (train.py:468-470)."""
    import numpy as np

    return float(np.mean(np.array(list(metrics.values()))))


def create_checkpoint_manager(
    checkpoint_dir: str | Path,
    config: Optional[Config] = None,
    max_to_keep: int = 3,
    save_interval_steps: int = 20,
) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        save_interval_steps=save_interval_steps,
    )
    return ocp.CheckpointManager(
        Path(checkpoint_dir).resolve(),
        options=options,
        item_names=("params", "state"),
        metadata=config.metadata() if config is not None else None,
    )


def save_checkpoint(
    manager: ocp.CheckpointManager, step: int, params, state, force: bool = False
) -> bool:
    if not force and not manager.should_save(step):
        return False
    manager.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            state=ocp.args.StandardSave(state if state else {"_empty": 0}),
        ),
        force=force,
    )
    return True


def check_metadata(manager: ocp.CheckpointManager, config: Config) -> bool:
    """Warn on config drift (reference train.py:816-819)."""
    stored = manager.metadata()
    stored = getattr(stored, "custom_metadata", stored)
    stored = dict(stored) if stored else None
    current = config.metadata()
    if stored and stored != current:
        warnings.warn(
            f"Checkpoint metadata mismatch:\n  stored:  {stored}\n  current: {current}"
        )
        return False
    return True


def restore_checkpoint(
    manager: ocp.CheckpointManager,
    params_like,
    state_like=None,
    step: Optional[int] = None,
):
    """Restore (params, state) at ``step`` (or latest).  Returns None if none."""
    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    restored = manager.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_like),
            state=ocp.args.StandardRestore(
                state_like if state_like else {"_empty": 0}
            ),
        ),
    )
    state = restored["state"]
    if isinstance(state, dict) and set(state.keys()) == {"_empty"}:
        state = {}
    return restored["params"], state, step


def restore_raw(checkpoint_dir: str | Path, step: Optional[int] = None):
    """Restore a checkpoint's params without a target structure.

    Used by the weight-surgery tools (copy_weights/inspect) and by the
    reference-checkpoint converter where the stored pytree layout is unknown.
    """
    manager = ocp.CheckpointManager(Path(checkpoint_dir).resolve(), item_names=("params", "state"))
    step = step if step is not None else manager.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
    restored = manager.restore(
        step, args=ocp.args.Composite(params=ocp.args.StandardRestore())
    )
    return restored["params"], step
