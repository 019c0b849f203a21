"""Rotary positional embeddings.

Semantics match reference rope.py:12-53: interleaved even/odd channel pairs
rotated by position-dependent angles, computed in float32 and cast back to the
input dtype.  The frequency table is precomputed once up to ``max_pos`` and
sliced per sequence length (the local-attention windows restart positions at 0
for every window, exactly as the reference does by passing each 16-token
window through SelfAttention afresh).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RopeFreqs(NamedTuple):
    cos: jax.Array  # (max_pos, dim // 2) float32
    sin: jax.Array  # (max_pos, dim // 2) float32


def precompute_frequencies(dim: int, max_pos: int, theta: float = 10_000.0) -> RopeFreqs:
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32)[: dim // 2] / dim)
    )
    t = jnp.arange(0, max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return RopeFreqs(cos=jnp.cos(freqs), sin=jnp.sin(freqs))


def apply_rope(x: jax.Array, rope: RopeFreqs) -> jax.Array:
    """Rotate channel pairs of ``x``.

    Args:
      x: (..., seq, heads, head_dim) — seq axis is third from the end... no:
         shape is (*batch, seq, num_heads, head_dim); positions run over the
         ``seq`` axis (axis -3), matching reference rope.py:39-41 which slices
         the frequency table by the sequence length.
    """
    seq_len = x.shape[-3]
    cos = rope.cos[:seq_len][:, None, :]  # (seq, 1, head_dim//2)
    sin = rope.sin[:seq_len][:, None, :]

    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)

    rotated = jnp.stack(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )  # (..., seq, heads, head_dim//2, 2)
    out = rotated.reshape(*rotated.shape[:-2], -1)
    return out.astype(x.dtype)
