"""Functional NN primitives over plain-dict parameter pytrees.

Design notes (TPU-first):
  * Arrays flow in NWC layout ``(batch, length, channels)`` so LayerNorm and
    pointwise ops hit the lane dimension and 1x1 convs are plain matmuls on
    the MXU.  (The reference keeps per-sample (C, L) Equinox modules and
    vmaps; semantics are identical, layout is not.)
  * Weights are stored MXU-friendly: Linear as (in, out) so application is
    ``x @ w``; Conv1d as (K, I/groups, O) i.e. XLA's 'WIO'.
  * LayerNorm is computed in float32 and cast back, matching the reference's
    explicit fp32 casts (model.py:100,117,162,190,539,546,759).
  * Init distributions match Equinox defaults (uniform ±1/sqrt(fan_in)) so a
    fresh model is statistically the same as the reference's.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale, dtype=dtype)


def init_linear(key, in_features: int, out_features: int, use_bias: bool = True) -> Params:
    wkey, bkey = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_features)
    p: Params = {"w": _uniform(wkey, (in_features, out_features), scale)}
    if use_bias:
        p["b"] = _uniform(bkey, (out_features,), scale)
    return p


def init_conv1d(
    key, in_channels: int, out_channels: int, kernel_size: int, groups: int = 1
) -> Params:
    wkey, bkey = jax.random.split(key)
    fan_in = (in_channels // groups) * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    return {
        "w": _uniform(wkey, (kernel_size, in_channels // groups, out_channels), scale),
        "b": _uniform(bkey, (out_channels,), scale),
    }


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def linear(x: jax.Array, p: Params) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1d(
    x: jax.Array,
    p: Params,
    stride: int = 1,
    padding: str = "VALID",
    groups: int = 1,
) -> jax.Array:
    """1-D convolution in NWC layout.  x: (B, L, C_in) -> (B, L', C_out)."""
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + p["b"].astype(x.dtype)


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing (channel) axis, computed in fp32.

    Matches eqx.nn.LayerNorm semantics (mean/var over the normalized shape,
    affine scale+bias, eps=1e-5) with the reference's fp32-compute convention.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def dropout(
    x: jax.Array, rate: float, key: jax.Array | None, enabled: bool,
    fast_rng: bool = False,
) -> jax.Array:
    """Inverted dropout; no-op when disabled (static python bool).

    ``fast_rng`` derives the mask from the RBG bit generator instead of
    threefry: JAX's default threefry costs many VPU ops per random word,
    while rbg is hardware-backed on TPU.  Masks only need independence and
    per-key reproducibility — no parity contract binds their exact stream
    (the reference's masks are Equinox threefry draws we never match
    anyway).  The rbg key is derived injectively from the caller's key, so
    key-splitting discipline is unchanged.
    """
    if not enabled or rate == 0.0:
        return x
    assert key is not None, "dropout requires a key when enabled"
    keep = 1.0 - rate
    if fast_rng:
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            data = jax.random.key_data(key)
        else:
            data = key
        data = data.astype(jnp.uint32).reshape(-1)
        rbg = jax.random.wrap_key_data(jnp.tile(data, 4)[:4], impl="rbg")
        mask = jax.random.bernoulli(rbg, keep, x.shape)
    else:
        mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def gelu(x: jax.Array) -> jax.Array:
    # jax.nn.gelu default (tanh approximation) — same as the reference's
    # jax.nn.gelu calls (model.py:164,234).
    return jax.nn.gelu(x)
