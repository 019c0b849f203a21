"""Device mesh + sharding layout.

The reference's data parallelism is implicit: a 1-D mesh, replicated params,
batch-sharded inputs, GSPMD-inserted all-reduces (train.py:833-842,238-244).
Here the layout is explicit and first-class:

  * ``make_mesh`` builds an ("ensemble", "data") mesh over ICI — the ensemble
    (population) axis is the reference's vmap axis (train.py:788-795) promoted
    to a mesh dimension so population members can live on disjoint device
    groups; with ensemble_size=1 it degenerates to pure DP.
  * ``batch_spec`` shards the per-step batch over "data"; params/optimizer
    state are replicated within a data group and sharded over "ensemble" via
    their leading population axis.
  * Gradients all-reduce over "data" happens inside jit via GSPMD exactly as
    on the reference, but the mesh/axis names make it visible and testable
    (tests force an 8-device CPU platform).
  * ``initialize_multihost`` wires jax.distributed for multi-host DCN; data
    loading then feeds per-host shards via
    ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ENSEMBLE_AXIS = "ensemble"
MODEL_AXIS = "model"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up for multi-host DCN training (no-op if single)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    ensemble_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    model_size: int = 1,
) -> Mesh:
    """("ensemble", "data"[, "model"]) mesh.

    ``model_size`` > 1 appends a tensor-parallel axis (innermost, so TP
    collectives ride the fastest ICI dimension); params then shard over it
    via :mod:`.tp`.  A ``model_size`` that does not divide the device count
    raises (an explicitly requested TP degree must never be silently
    dropped); an ``ensemble_size`` that does not divide falls back to 1
    with a warning (matching the reference's population default of 1).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_size > 1 and n % model_size:
        raise ValueError(
            f"model_parallel_size {model_size} does not divide the "
            f"{n}-device count; pick a divisor or drop the model axis"
        )
    if model_size > 1:
        axes: tuple = (ENSEMBLE_AXIS, DATA_AXIS, MODEL_AXIS)
        n_groups = n // model_size
        e = ensemble_size if ensemble_size > 1 and n_groups % ensemble_size == 0 else 1
        if e != ensemble_size and ensemble_size > 1:
            warnings.warn(
                f"ensemble_size {ensemble_size} does not divide the "
                f"{n_groups} data groups; using ensemble axis of 1",
                stacklevel=2,
            )
        shape: tuple = (e, n_groups // e, model_size)
    elif ensemble_size > 1 and n % ensemble_size == 0:
        axes = (ENSEMBLE_AXIS, DATA_AXIS)
        shape = (ensemble_size, n // ensemble_size)
    else:
        if ensemble_size > 1:
            warnings.warn(
                f"ensemble_size {ensemble_size} does not divide the "
                f"{n}-device count; using ensemble axis of 1",
                stacklevel=2,
            )
        axes = (ENSEMBLE_AXIS, DATA_AXIS)
        shape = (1, n)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axes)


def batch_spec(mesh: Mesh, leading_axes: int = 0) -> NamedSharding:
    """Shard the batch axis over "data"; optional unsharded leading axes
    (e.g. the gradient-accumulation axis)."""
    return NamedSharding(mesh, P(*([None] * leading_axes), DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ensemble_spec(mesh: Mesh) -> NamedSharding:
    """Population-axis sharding for params/opt state with a leading E axis."""
    return NamedSharding(mesh, P(ENSEMBLE_AXIS))


def shard_params(params, mesh: Mesh, ensemble: bool = False):
    """Place a param pytree: replicated, or population-sharded on axis 0."""
    sharding = ensemble_spec(mesh) if ensemble else replicated(mesh)
    return jax.device_put(params, sharding)


def tp_active(mesh: Mesh) -> bool:
    return mesh.shape.get(MODEL_AXIS, 1) > 1


def make_param_placer(mesh: Mesh, num_heads: int):
    """One placement function for params/optimizer state on this mesh.

    Pure-DP/ensemble meshes replicate (or shard axis 0 over "ensemble");
    meshes with a real "model" axis place Megatron TP shardings via
    :func:`.tp.shard_params_tp`.  Used by the train loop's rollback and
    evolution re-shard sites so every placement goes through the same rules.
    """
    if tp_active(mesh):
        from .tp import shard_params_tp

        def place(tree, ensemble: bool = False):
            return shard_params_tp(tree, mesh, num_heads=num_heads, ensemble=ensemble)

        return place

    def place(tree, ensemble: bool = False):
        return shard_params(tree, mesh, ensemble=ensemble)

    return place


def host_local_batch_to_global(batch, mesh: Mesh, leading_axes: int = 0):
    """Multi-host: assemble per-host shards into a global batch array.

    ``leading_axes`` unsharded axes precede the data-sharded batch axis
    (e.g. 1 for the (accum, batch, ...) minibatch layout)."""
    spec = P(*([None] * leading_axes), DATA_AXIS)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        ),
        batch,
    )
