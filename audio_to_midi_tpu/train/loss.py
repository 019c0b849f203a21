"""Training loss.

Reference semantics (train.py:39-62): per-sample loss is sigmoid binary
cross-entropy SUMMED over (frames x 90 keys) — the sum (not mean) defines the
loss scale everything else is tuned around (AdamW eps=1e-3, the 10k
loss-scaling threshold) — multiplied by the f16 grad scale, then MEANED over
the batch.  Logits are cast to f32 before the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models import model as model_lib
from ..models.rope import RopeFreqs


def sigmoid_bce_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Summed BCE per sample.  logits/labels: (..., F, K) -> (...)."""
    loss = optax.losses.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.sum(loss, axis=(-2, -1))


def batch_loss(
    params,
    cfg: ModelConfig,
    audio: jax.Array,
    labels: jax.Array,
    rope: RopeFreqs,
    scale: jax.Array,
    key: jax.Array | None,
    compute_dtype,
    enable_dropout: bool = True,
) -> jax.Array:
    """Scaled mean-over-batch of summed BCE (reference compute_loss).

    Forward runs in ``compute_dtype``; loss in f32.
    """
    params_c = model_lib.cast_params(params, compute_dtype)
    audio_c = audio.astype(compute_dtype)
    logits, _probs = model_lib.forward(
        params_c, cfg, audio_c, rope, key=key, enable_dropout=enable_dropout
    )
    logits = logits.astype(jnp.float32)
    per_sample = sigmoid_bce_sum(logits, labels.astype(jnp.float32))
    return jnp.mean(per_sample * scale.astype(jnp.float32))
