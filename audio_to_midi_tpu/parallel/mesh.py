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
    via :mod:`.tp`.  Axis sizes that do not divide the device count fall
    back to 1 (pure DP) rather than erroring.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_size > 1 and n % model_size == 0:
        axes: tuple = (ENSEMBLE_AXIS, DATA_AXIS, MODEL_AXIS)
        n_groups = n // model_size
        e = ensemble_size if ensemble_size > 1 and n_groups % ensemble_size == 0 else 1
        shape: tuple = (e, n_groups // e, model_size)
    elif ensemble_size > 1 and n % ensemble_size == 0:
        axes = (ENSEMBLE_AXIS, DATA_AXIS)
        shape = (ensemble_size, n // ensemble_size)
    else:
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
