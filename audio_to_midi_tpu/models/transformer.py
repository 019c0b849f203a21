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

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import pallas_attention, pallas_pair

from . import nn
from .attention import (
    _local_padding,
    init_self_attention,
    local_self_attention,
    self_attention,
)
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
    fast_rng: bool = False,
) -> jax.Array:
    h = nn.linear(x, p["in_proj"])
    x1, x2 = jnp.split(h, 2, axis=-1)
    h = nn.gelu(x1) * x2
    out = nn.linear(h, p["out_proj"])
    return nn.dropout(out, dropout_rate, key, enable_dropout, fast_rng=fast_rng)


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
        fast_rng=cfg.fast_dropout_rng,
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


# ---------------------------------------------------------------------------
# Pair megakernel path: the whole alternating pair (4 sublayers) runs as one
# Pallas kernel per scan step (ops/pallas_pair.py); backward delegates to the
# XLA ``alternating_layer`` via custom_vjp, so gradients are exact w.r.t. the
# same math.
# ---------------------------------------------------------------------------


def _pair_rope_tables(rope: RopeFreqs, cfg: ModelConfig, p_len: int, pad_l: int):
    """Kernel rope tables, one row per padded-sequence row.

    Phase A of the two-phase local attention uses position ``r mod window``
    (windows start at 0, window, 2*window, …); phase B uses
    ``(r - stride) mod window`` (windows start at stride, stride+window, …).
    Global positions are absolute over the valid region, i.e. row (pad_l + i)
    gets position i."""
    window = cfg.local_context_window
    stride = window // 2
    reps = -(-p_len // window)
    cos_a = jnp.tile(rope.cos[:window], (reps, 1))[:p_len]
    sin_a = jnp.tile(rope.sin[:window], (reps, 1))[:p_len]
    cos_b = jnp.roll(cos_a, stride, axis=0)
    sin_b = jnp.roll(sin_a, stride, axis=0)
    cos_g = jnp.concatenate([jnp.ones((pad_l,) + rope.cos.shape[1:]), rope.cos])[:p_len]
    sin_g = jnp.concatenate([jnp.zeros((pad_l,) + rope.sin.shape[1:]), rope.sin])[:p_len]
    return cos_a, sin_a, cos_b, sin_b, cos_g, sin_g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_pair(xp, p, rope, cfg: ModelConfig, valid_len: int, pad_l: int):
    """xp: (B, P, D) local-padded (valid rows at offset pad_l, rest zero)."""
    tables = _pair_rope_tables(rope, cfg, xp.shape[1], pad_l)
    return pallas_pair.fused_transformer_pair(
        xp,
        pallas_pair.pair_weights(p, xp.dtype),
        tables,
        num_heads=cfg.num_transformer_heads,
        valid_len=valid_len,
        pad_l=pad_l,
        window=cfg.local_context_window,
    )


def _pair_xla(xp, p, rope, cfg: ModelConfig, valid_len: int, pad_l: int):
    """jnp mirror: crop -> alternating pair on the XLA path -> re-pad."""
    pad_r = xp.shape[1] - pad_l - valid_len
    x = xp[:, pad_l : pad_l + valid_len]
    xla_cfg = dataclasses.replace(cfg, attention_impl="xla")
    y = alternating_layer(x, p, rope, xla_cfg)
    return jnp.pad(y, ((0, 0), (pad_l, pad_r), (0, 0)))


def _fused_pair_fwd(xp, p, rope, cfg, valid_len, pad_l):
    return _fused_pair(xp, p, rope, cfg, valid_len, pad_l), (xp, p, rope)


def _fused_pair_bwd(cfg, valid_len, pad_l, residuals, g):
    xp, p, rope = residuals
    _, vjp = jax.vjp(
        lambda xp, p: _pair_xla(xp, p, rope, cfg, valid_len, pad_l), xp, p
    )
    dxp, dp = vjp(g)
    return dxp, dp, None


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)


# --- fused attention-sublayer path (ops/pallas_sublayer.py) ---------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_local_sub(xp, p, rope, cfg: ModelConfig, valid_len: int, pad_l: int):
    from ..ops import pallas_sublayer

    tables = _pair_rope_tables(rope, cfg, xp.shape[1], pad_l)
    return pallas_sublayer.fused_local_sublayer(
        xp,
        pallas_sublayer.sublayer_weights(p["attention_norm"], p["attention"], xp.dtype),
        tables[:4],
        num_heads=cfg.num_transformer_heads,
        valid_len=valid_len,
        pad_l=pad_l,
        window=cfg.local_context_window,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_global_sub(xp, p, rope, cfg: ModelConfig, valid_len: int, pad_l: int):
    from ..ops import pallas_sublayer

    tables = _pair_rope_tables(rope, cfg, xp.shape[1], pad_l)
    return pallas_sublayer.fused_global_sublayer(
        xp,
        pallas_sublayer.sublayer_weights(p["attention_norm"], p["attention"], xp.dtype),
        tables[4:],
        num_heads=cfg.num_transformer_heads,
        valid_len=valid_len,
        pad_l=pad_l,
    )


def _sub_xla(xp, p, rope, cfg: ModelConfig, valid_len: int, pad_l: int, local: bool):
    """jnp mirror of a fused sublayer: crop -> pre-LN attention + residual ->
    re-pad (rows outside the valid region stay exactly zero)."""
    pad_r = xp.shape[1] - pad_l - valid_len
    x = xp[:, pad_l : pad_l + valid_len]
    xla_cfg = dataclasses.replace(cfg, attention_impl="xla")
    normed = nn.layer_norm(x, p["attention_norm"])
    if local:
        r = local_self_attention(normed, p["attention"], rope, xla_cfg)
    else:
        r = self_attention(normed, p["attention"], rope, xla_cfg)
    return jnp.pad(x + r, ((0, 0), (pad_l, pad_r), (0, 0)))


def _make_sub_vjp(fused, local):
    def fwd(xp, p, rope, cfg, valid_len, pad_l):
        return fused(xp, p, rope, cfg, valid_len, pad_l), (xp, p, rope)

    def bwd(cfg, valid_len, pad_l, residuals, g):
        xp, p, rope = residuals
        _, vjp = jax.vjp(
            lambda xp, p: _sub_xla(xp, p, rope, cfg, valid_len, pad_l, local), xp, p
        )
        dxp, dp = vjp(g)
        return dxp, dp, None

    return fwd, bwd


_fused_local_sub.defvjp(*_make_sub_vjp(_fused_local_sub, True))
_fused_global_sub.defvjp(*_make_sub_vjp(_fused_global_sub, False))


def _pair_kernel_applicable(cfg: ModelConfig, x: jax.Array, enable_dropout: bool) -> bool:
    # Dropout only blocks the kernel paths when the rate is non-zero.
    if (
        cfg.attention_impl not in ("pallas_pair", "pallas_fused")
        or (enable_dropout and cfg.transformer_dropout_rate > 0)
        or x.ndim != 3
        or not pallas_attention.mosaic_dtype_ok(x.dtype)
    ):
        return False
    s = x.shape[1]
    pad_l, pad_r = _local_padding(s, cfg.local_context_window)
    p_len = s + pad_l + pad_r
    return (
        x.shape[-1] == cfg.transformer_hidden_dim
        and cfg.attention_size * cfg.num_transformer_heads == cfg.transformer_hidden_dim
        and pallas_pair.pair_supported(
            p_len, cfg.transformer_hidden_dim, cfg.num_transformer_heads,
            cfg.local_context_window,
        )
    )


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
    if _pair_kernel_applicable(cfg, x, enable_dropout):
        s = x.shape[1]
        pad_l, pad_r = _local_padding(s, cfg.local_context_window)
        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))

        if cfg.attention_impl == "pallas_fused":
            # Per-sublayer fusion: attention sublayers run as single kernels
            # (LN+proj+rope+attn+out-proj+residual); FFNs stay on XLA (they
            # measure at ~87% MFU there) with the padding rows re-zeroed.
            p_len = xp.shape[1]
            col = jnp.arange(p_len)[None, :, None]
            row_valid = (col >= pad_l) & (col < pad_l + s)

            def ffn_sub(h, p):
                normed = nn.layer_norm(h, p["ff_norm"])
                r = feed_forward(
                    normed, p["ff"], dropout_rate=0.0, key=None, enable_dropout=False
                )
                return h + jnp.where(row_valid, r, jnp.zeros_like(r))

            def fused_body(h, p):
                h = _fused_local_sub(h, p["local"], rope, cfg, s, pad_l)
                h = ffn_sub(h, p["local"])
                h = _fused_global_sub(h, p["global"], rope, cfg, s, pad_l)
                h = ffn_sub(h, p["global"])
                return h, None

            if cfg.transformer_remat:
                fused_body = partial(
                    jax.checkpoint,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )(fused_body)

            out, _ = jax.lax.scan(
                fused_body, xp, stacked, unroll=cfg.transformer_scan_unroll
            )
            return out[:, pad_l : pad_l + s]

        def pair_body(h, p):
            return _fused_pair(h, p, rope, cfg, s, pad_l), None

        out, _ = jax.lax.scan(
            pair_body, xp, stacked, unroll=cfg.transformer_scan_unroll
        )
        return out[:, pad_l : pad_l + s]
    if key is not None:
        layer_keys = jax.random.split(key, n)
    else:
        # Dummy keys so the scan carry structure is static; unused because
        # enable_dropout is a trace-time constant.
        layer_keys = jnp.zeros((n, 2), dtype=jnp.uint32)

    def body(h, layer):
        p, k = layer
        k = k if key is not None else None
        h = alternating_layer(h, p, rope, cfg, key=k, enable_dropout=enable_dropout)
        return h, None

    if cfg.transformer_remat:
        body = partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )(body)

    out, _ = jax.lax.scan(
        body, x, (stacked, layer_keys), unroll=cfg.transformer_scan_unroll
    )
    return out
