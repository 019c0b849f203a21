from . import mesh
from .mesh import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    batch_spec,
    ensemble_spec,
    initialize_multihost,
    make_mesh,
    replicated,
    shard_params,
)

__all__ = [
    "mesh",
    "DATA_AXIS",
    "ENSEMBLE_AXIS",
    "batch_spec",
    "ensemble_spec",
    "initialize_multihost",
    "make_mesh",
    "replicated",
    "shard_params",
]
