from . import attention, convnext, model, nn, rope, transformer
from .model import cast_params, forward, init, make_rope, param_count, predict
from .rope import RopeFreqs, apply_rope, precompute_frequencies

__all__ = [
    "attention",
    "convnext",
    "model",
    "nn",
    "rope",
    "transformer",
    "cast_params",
    "forward",
    "init",
    "make_rope",
    "param_count",
    "predict",
    "RopeFreqs",
    "apply_rope",
    "precompute_frequencies",
]
