from . import mesh, tp
from .mesh import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    MODEL_AXIS,
    batch_spec,
    ensemble_spec,
    initialize_multihost,
    make_mesh,
    replicated,
    shard_params,
)
from .tp import shard_params_tp, tp_spec_tree

__all__ = [
    "mesh",
    "tp",
    "DATA_AXIS",
    "ENSEMBLE_AXIS",
    "MODEL_AXIS",
    "batch_spec",
    "ensemble_spec",
    "initialize_multihost",
    "make_mesh",
    "replicated",
    "shard_params",
    "shard_params_tp",
    "tp_spec_tree",
]
