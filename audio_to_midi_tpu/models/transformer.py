"""Transformer: GLU feed-forward, pre-LN layers, alternating local/global
attention, stacked-weight scan with rematerialization.

Reference semantics: FeedForwardBlock (model.py:200-238) is a GLU variant —
Linear D->2*inter, split, gelu(x1)*x2, Linear inter->D, dropout.
TransformerLayer (model.py:474-556) is pre-LN (fp32) attention + residual then
pre-LN FFN + residual.  AlternatingLocalAndGlobalAttention (model.py:559-612)
runs a local (window-16) layer then a global layer.  TransformerStack
(model.py:615-670) stacks N alternating layers with identical structure and
executes them as a ``lax.scan`` over stacked weights under ``jax.checkpoint``
with the ``dots_with_no_batch_dims_saveable`` policy — one compiled layer body,
remat-friendly; we do the same.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import nn
from .attention import init_self_attention, local_self_attention, self_attention
from .nn import Params
from .rope import RopeFreqs


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_feed_forward(key, hidden_dim: int, intermediate_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": nn.init_linear(k1, hidden_dim, 2 * intermediate_dim),
        "out_proj": nn.init_linear(k2, intermediate_dim, hidden_dim),
    }


def init_transformer_layer(key, cfg: ModelConfig) -> Params:
    d = cfg.transformer_hidden_dim
    attn_key, ff_key = jax.random.split(key)
    return {
        "attention_norm": nn.init_layer_norm(d),
        "attention": init_self_attention(attn_key, cfg),
        "ff_norm": nn.init_layer_norm(d),
        "ff": init_feed_forward(ff_key, d, cfg.transformer_intermediate_size),
    }


def init_alternating_layer(key, cfg: ModelConfig) -> Params:
    local_key, global_key = jax.random.split(key)
    return {
        "local": init_transformer_layer(local_key, cfg),
        "global": init_transformer_layer(global_key, cfg),
    }


def init_transformer_stack(key, cfg: ModelConfig) -> Params:
    """Stacked params: every leaf gains a leading (num_layers,) axis."""
    keys = jax.random.split(key, cfg.num_transformer_layers)
    layers = [init_alternating_layer(k, cfg) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def feed_forward(
    x: jax.Array,
    p: Params,
    *,
    dropout_rate: float,
    key: jax.Array | None,
    enable_dropout: bool,
) -> jax.Array:
    h = nn.linear(x, p["in_proj"])
    x1, x2 = jnp.split(h, 2, axis=-1)
    h = nn.gelu(x1) * x2
    out = nn.linear(h, p["out_proj"])
    return nn.dropout(out, dropout_rate, key, enable_dropout)


def transformer_layer(
    x: jax.Array,
    p: Params,
    rope: RopeFreqs,
    cfg: ModelConfig,
    *,
    local: bool,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Pre-LN attention + residual, pre-LN GLU FFN + residual.  x: (B, S, D)."""
    if key is not None:
        attn_key, ff_key = jax.random.split(key)
    else:
        attn_key = ff_key = None

    normed = nn.layer_norm(x, p["attention_norm"])
    if local:
        r = local_self_attention(
            normed, p["attention"], rope, cfg, key=attn_key, enable_dropout=enable_dropout
        )
    else:
        r = self_attention(
            normed, p["attention"], rope, cfg, key=attn_key, enable_dropout=enable_dropout
        )
    h = x + r

    normed_h = nn.layer_norm(h, p["ff_norm"])
    r = feed_forward(
        normed_h,
        p["ff"],
        dropout_rate=cfg.transformer_dropout_rate,
        key=ff_key,
        enable_dropout=enable_dropout,
    )
    return h + r


def alternating_layer(
    x: jax.Array,
    p: Params,
    rope: RopeFreqs,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Local (window) layer, then global layer (reference model.py:599-612)."""
    if key is not None:
        # Reference splits into (global_key, local_key) in that order
        # (model.py:607) — match it so nothing depends on ordering.
        global_key, local_key = jax.random.split(key)
    else:
        global_key = local_key = None
    x = transformer_layer(
        x, p["local"], rope, cfg, local=True, key=local_key, enable_dropout=enable_dropout
    )
    x = transformer_layer(
        x, p["global"], rope, cfg, local=False, key=global_key, enable_dropout=enable_dropout
    )
    return x


def transformer_stack(
    x: jax.Array,
    stacked: Params,
    rope: RopeFreqs,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Homogeneous-layer scan over stacked weights with remat.

    x: (B, S, D).  Mirrors reference model.py:649-670 (filter_vmap'd layer
    stack executed via lax.scan under jax.checkpoint).
    """
    n = cfg.num_transformer_layers
    if key is not None:
        layer_keys = jax.random.split(key, n)
    else:
        # Dummy keys so the scan carry structure is static; unused because
        # enable_dropout is a trace-time constant.
        layer_keys = jnp.zeros((n, 2), dtype=jnp.uint32)

    @partial(
        jax.checkpoint,
        policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    )
    def body(h, layer):
        p, k = layer
        k = k if key is not None else None
        h = alternating_layer(h, p, rope, cfg, key=k, enable_dropout=enable_dropout)
        return h, None

    out, _ = jax.lax.scan(body, x, (stacked, layer_keys))
    return out
