"""Top-level audio->MIDI transcription model.

Pipeline (reference model.py:673-773): 7-stage ConvNeXt CNN over raw stereo
audio -> final LayerNorm -> (optional projection) -> alternating local/global
transformer -> LayerNorm + Linear + sigmoid decoder.

Geometry with the default config: (B, 2, 80000) stereo 5 s @ 16 kHz ->
stem /5 -> six /2 downsamples -> (B, 250, 256) -> (B, 250, 90) logits/probs.

The public surface is functional: ``init(key, cfg) -> (params, state)`` and
``forward(params, cfg, audio, rope, ...)``; ``state`` is an empty placeholder
kept for API parity with the reference's ``eqx.nn.make_with_state`` (the model
has no stateful layers).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import nn
from .convnext import cnn_forward, init_cnn
from .nn import Params
from .rope import RopeFreqs, precompute_frequencies
from .transformer import init_transformer_stack, transformer_stack

State = dict[str, Any]


def init(key: jax.Array, cfg: ModelConfig) -> tuple[Params, State]:
    cnn_key, transformer_key, decoder_key = jax.random.split(key, 3)
    cnn_params = init_cnn(cnn_key, cfg)
    params: Params = {
        "cnn": cnn_params,
        "transformer": init_transformer_stack(transformer_key, cfg),
        "decoder": {
            "norm": nn.init_layer_norm(cfg.transformer_hidden_dim),
            "out": nn.init_linear(decoder_key, cfg.transformer_hidden_dim, cfg.output_vocab),
        },
    }
    return params, {}


def make_rope(cfg: ModelConfig) -> RopeFreqs:
    return precompute_frequencies(cfg.attention_size, cfg.rope_max_positions, cfg.rope_theta)


def decoder(x: jax.Array, p: Params) -> tuple[jax.Array, jax.Array]:
    """LN -> Linear -> sigmoid (reference model.py:185-198)."""
    out = nn.layer_norm(x, p["norm"])
    logits = nn.linear(out, p["out"])
    probs = jax.nn.sigmoid(logits)
    return logits, probs


def forward(
    params: Params,
    cfg: ModelConfig,
    audio: jax.Array,
    rope: RopeFreqs,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched forward.  audio: (B, 2, num_samples) -> (B, frames, 90) x2.

    Returns (logits, probs).  Stages carry ``jax.named_scope`` annotations so
    HLO dumps and profiler traces read by component (SURVEY §5).
    """
    if key is not None:
        cnn_key, transformer_key = jax.random.split(key)
    else:
        cnn_key = transformer_key = None

    x = jnp.transpose(audio, (0, 2, 1))  # (B, L, 2): NWC for the TPU conv path
    with jax.named_scope("a2m.cnn"):
        h = cnn_forward(x, params["cnn"], cfg, key=cnn_key, enable_dropout=enable_dropout)
    with jax.named_scope("a2m.transformer"):
        h = transformer_stack(
            h, params["transformer"], rope, cfg,
            key=transformer_key, enable_dropout=enable_dropout,
        )
    with jax.named_scope("a2m.decoder"):
        return decoder(h, params["decoder"])


def predict(
    params: Params,
    cfg: ModelConfig,
    samples: jax.Array,
    rope: RopeFreqs,
) -> tuple[jax.Array, jax.Array]:
    """Single-sample inference.  samples: (2, num_samples) -> (frames, 90) x2."""
    logits, probs = forward(params, cfg, samples[None], rope)
    return logits[0], probs[0]


def compute_model_output_frames(params: Params, cfg: ModelConfig, num_samples: int) -> int:
    """Dynamic output-frame probe: run a dummy zeros window through the model
    and read the frame count off the logits (reference train.py:64-73).
    ``ModelConfig.output_frames(num_samples)`` computes the same number
    statically; this exists for parity/verification."""
    rope = make_rope(cfg)
    samples = jnp.zeros((1, 2, num_samples), jnp.float32)
    logits, _ = forward(params, cfg, samples, rope)
    return int(logits.shape[1])


def init_ensemble(key: jax.Array, cfg: ModelConfig, ensemble_size: int) -> tuple[Params, State]:
    """Population init: every leaf gains a leading (E,) axis (reference
    train.py:788-795 filter_vmap make_ensemble)."""
    keys = jax.random.split(key, ensemble_size)
    params = jax.vmap(lambda k: init(k, cfg)[0])(keys)
    return params, {}


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def cast_params(params: Params, dtype) -> Params:
    """Cast all inexact leaves (reference infer.py:27-32)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, params)
