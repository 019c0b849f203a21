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


def rope_permutation(head_dim: int):
    """Column permutation mapping interleaved rotation pairs to halves.

    The reference rotates interleaved channel pairs (2j, 2j+1) (rope.py:44-52).
    Strided even/odd slicing forces lane relayouts on TPU, so we instead store
    the q/k up-projection weights with their per-head output channels
    permuted as [0, 2, 4, ..., 1, 3, 5, ...] and rotate contiguous halves
    (:func:`apply_rope_halves`).  Because q and k are permuted identically and
    attention only consumes q·k dot products, the attention output is exactly
    invariant (the fp reduction order of the dot is the only difference).
    """
    import numpy as np

    half = head_dim // 2
    perm = np.empty((head_dim,), np.int64)
    perm[:half] = np.arange(half) * 2
    perm[half:] = np.arange(half) * 2 + 1
    return perm


def permute_qk_weight_for_rope(w, num_heads: int):
    """Permute a (in, H*hd) q/k up-projection weight into halves layout."""
    import numpy as np

    in_dim, out = w.shape
    hd = out // num_heads
    perm = rope_permutation(hd)
    w = w.reshape(in_dim, num_heads, hd)
    return w[..., perm].reshape(in_dim, out)


def apply_rope_halves(x: jax.Array, rope: RopeFreqs) -> jax.Array:
    """RoPE for halves-layout channels: x1 = first half, x2 = second half.

    Equivalent to :func:`apply_rope` on interleaved channels after
    :func:`permute_qk_weight_for_rope` — contiguous slices, no lane shuffles.
    x: (..., seq, heads, head_dim).
    """
    seq_len = x.shape[-3]
    cos = rope.cos[:seq_len][:, None, :]
    sin = rope.sin[:seq_len][:, None, :]
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


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
