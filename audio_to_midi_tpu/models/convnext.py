"""ConvNeXt-style 1-D audio encoder.

Reference semantics (model.py:84-167, 673-759):
  * Stem: Conv1d 2->dims[0], kernel=stride=5, then channelwise LayerNorm(fp32).
  * Downsample: LayerNorm(fp32) then Conv1d k=2 s=2 doubling channels.
  * Block: depthwise k=7 SAME -> LN(fp32) -> 1x1 to hidden -> GELU -> 1x1 back
    -> layer-scale gamma (init 1e-6) -> stochastic depth -> + residual.

TPU-first differences: everything is batched NWC ``(B, L, C)``; the 1x1 convs
are stored/applied as matmuls; the stem's k=s=5 conv is a patch-reshape +
matmul (identical arithmetic, keeps the MXU busy instead of a tiny conv).

Note: the reference never enables stochastic depth in the CNN path — its
Sequential call sites pass only ``key=`` so ``enable_dropout`` stays False
(model.py:757,160,167).  We reproduce that default; set
``ModelConfig.enable_cnn_stochastic_depth=True`` to actually turn it on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.pallas_attention import mosaic_dtype_ok
from ..ops.pallas_convnext import fused_convnext_stage_diff, stage_supported
from ..ops.pallas_convnext_bwd import bwd_stage_supported, stage_blocks_fused_bwd
from . import convnext_packed, nn
from .nn import Params


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_stem(key, out_channels: int, kernel_size: int = 5) -> Params:
    return {
        "conv": nn.init_conv1d(key, 2, out_channels, kernel_size),
        "norm": nn.init_layer_norm(out_channels),
    }


def init_downsample(key, in_channels: int, out_channels: int) -> Params:
    return {
        "conv": nn.init_conv1d(key, in_channels, out_channels, 2),
        "norm": nn.init_layer_norm(in_channels),
    }


def init_block(key, channels: int, hidden_dim: int, kernel_size: int = 7) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "depth_conv": nn.init_conv1d(k1, channels, channels, kernel_size, groups=channels),
        "norm": nn.init_layer_norm(channels),
        "pw1": nn.init_linear(k2, channels, hidden_dim),
        "pw2": nn.init_linear(k3, hidden_dim, channels),
        "gamma": jnp.full((channels,), 1e-6),
    }


def sdd_schedule(cfg: ModelConfig) -> np.ndarray:
    """Per-block stochastic-depth rates, 0 -> cfg.sdd_rate over all blocks
    (reference model.py:700-705's linearly ramped ``StochasticDepthDropout``
    rates).  Single source of truth for the schedule."""
    return np.linspace(0.0, cfg.sdd_rate, sum(cfg.depths))


def init_cnn(key, cfg: ModelConfig) -> Params:
    """Build all 7 stages.

    Blocks within a stage are homogeneous, so their params are STACKED along
    a leading (depth,) axis and executed with ``lax.scan`` — one compiled
    block body per stage instead of 39 unrolled blocks (the reference unrolls
    an eqx Sequential, model.py:707-713; scanning is semantically identical
    and keeps XLA programs and compile times small).
    """
    dims = cfg.dims
    hidden = cfg.cnn_hidden_dims
    depths = cfg.depths

    stages = []
    keys = jax.random.split(key, len(dims))
    for i, stage_key in enumerate(keys):
        ds_key, blocks_key = jax.random.split(stage_key)
        if i == 0:
            down = init_stem(ds_key, dims[0])
        else:
            down = init_downsample(ds_key, dims[i - 1], dims[i])
        block_keys = jax.random.split(blocks_key, depths[i])
        blocks = [init_block(bk, dims[i], hidden[i]) for bk in block_keys]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        stages.append({"down": down, "blocks": stacked})
    return {"stages": stages, "final_norm": nn.init_layer_norm(dims[-1])}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def stem(x: jax.Array, p: Params, kernel_size: int = 5) -> jax.Array:
    """x: (B, L, 2) -> (B, L // k, C).  Conv k=s implemented as patch matmul."""
    b, length, cin = x.shape
    w = p["conv"]["w"]  # (K, 2, C)
    k = w.shape[0]
    patches = x[:, : (length // k) * k, :].reshape(b, length // k, k * cin)
    wmat = w.reshape(k * cin, w.shape[2])
    out = patches @ wmat.astype(x.dtype) + p["conv"]["b"].astype(x.dtype)
    return nn.layer_norm(out, p["norm"])


def downsample(x: jax.Array, p: Params) -> jax.Array:
    """LN then k=2 s=2 conv doubling channels, as a patch matmul."""
    x = nn.layer_norm(x, p["norm"])
    b, length, cin = x.shape
    w = p["conv"]["w"]  # (2, C, 2C)
    patches = x[:, : (length // 2) * 2, :].reshape(b, length // 2, 2 * cin)
    wmat = w.reshape(2 * cin, w.shape[2])
    return patches @ wmat.astype(x.dtype) + p["conv"]["b"].astype(x.dtype)


def block(
    x: jax.Array,
    p: Params,
    *,
    sdd_rate: float,
    enable_sdd: bool,
    key: jax.Array | None,
) -> jax.Array:
    """ConvNeXt block.  x: (B, L, C)."""
    channels = x.shape[-1]
    out = nn.conv1d(x, p["depth_conv"], padding="SAME", groups=channels)
    out = nn.layer_norm(out, p["norm"])
    out = nn.linear(out, p["pw1"])
    out = nn.gelu(out)
    out = nn.linear(out, p["pw2"])
    out = p["gamma"].astype(out.dtype) * out
    if enable_sdd:
        # Whole-branch drop, one draw per sample (reference model.py:80-81).
        # sdd_rate may be a traced scalar (scanned per block).
        rand = jax.random.uniform(key, (x.shape[0], 1, 1))
        out = jnp.where(rand < sdd_rate, jnp.zeros_like(out), out)
    return out + x


def cnn_forward(
    x: jax.Array,
    params: Params,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Full encoder.  x: (B, L_samples, 2) -> (B, frames, dims[-1]).

    Each stage scans its stacked blocks under ``jax.checkpoint`` (per-block
    rematerialization, mirroring the transformer stack's policy)."""
    from functools import partial

    enable_sdd = enable_dropout and cfg.enable_cnn_stochastic_depth
    sdd_rates = sdd_schedule(cfg)
    n_blocks_total = sum(cfg.depths)
    if enable_sdd:
        all_keys = jax.random.split(key, n_blocks_total)
    else:
        all_keys = jnp.zeros((n_blocks_total, 2), dtype=jnp.uint32)

    # Packed (space-to-depth) path for the small-C early stages: every op is
    # a full-lane matmul (models/convnext_packed.py).  Eligible while
    # C < 64, C divides 128 and the packed row count stays integral.
    use_packed = not enable_sdd and cfg.cnn_impl in ("pallas", "pallas_stage")

    h = x
    depth_count = 0
    packed = False  # h currently in (B, R, f*C) packed layout for dims[i-1]
    for i, stage in enumerate(params["stages"]):
        c = cfg.dims[i]
        length = h.shape[1] * (128 // cfg.dims[i - 1] if packed else 1)
        want_packed = (
            use_packed
            and c < 64
            and 128 % c == 0
            and (length // (5 if i == 0 else 2)) % (128 // c) == 0
        )

        if want_packed:
            if i == 0:
                h = convnext_packed.packed_stem(h, stage["down"], 128 // c)
            elif packed:
                h = convnext_packed.packed_downsample(h, stage["down"], cfg.dims[i - 1])
            else:  # natural -> packed entry mid-CNN (unusual dims)
                h = downsample(h, stage["down"])
                b_, l_, _ = h.shape
                h = h.reshape(b_, l_ // (128 // c), 128)
            h = convnext_packed.packed_stage_blocks(h, stage["blocks"], c)
            packed = True
            depth_count += cfg.depths[i]
            continue

        if packed:
            h = convnext_packed.unpack(h, cfg.dims[i - 1])
            packed = False

        if i == 0:
            h = stem(h, stage["down"])
        else:
            h = downsample(h, stage["down"])

        depth_i = cfg.depths[i]

        if (not enable_sdd and cfg.cnn_impl == "pallas_stage"
                and mosaic_dtype_ok(h.dtype) and stage_supported(
            h.shape[1], cfg.dims[i], depth_i
        )):
            # Whole-stage megakernel (ops/pallas_convnext.py).  Measured
            # SLOWER than XLA on v5e for the default geometry (stage 6:
            # 3.45 ms vs 1.97 — the 7 serial depthwise taps starve the MXU),
            # so not part of the default "pallas" path; kept as an option
            # for other geometries.
            h = fused_convnext_stage_diff(h, stage["blocks"])
            depth_count += depth_i
            continue

        if (
            not enable_sdd
            and cfg.cnn_bwd_kernel
            and cfg.cnn_impl in ("pallas", "pallas_stage")
            and bwd_stage_supported(
                h.shape[1], cfg.dims[i], cfg.cnn_hidden_dims[i], h.dtype
            )
        ):
            # XLA forward (it beats the fused fwd kernel), fused Pallas
            # BACKWARD from the saved scan carries — no remat recompute.
            h = stage_blocks_fused_bwd(h, stage["blocks"])
            depth_count += depth_i
            continue

        stage_rates = jnp.asarray(
            sdd_rates[depth_count : depth_count + depth_i], jnp.float32
        )
        stage_keys = all_keys[depth_count : depth_count + depth_i]

        def body(carry, scanned):
            bp, rate, bkey = scanned
            out = block(
                carry,
                bp,
                sdd_rate=rate,
                enable_sdd=enable_sdd,
                key=bkey if enable_sdd else None,
            )
            return out, None

        if cfg.cnn_remat:
            body = partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )(body)

        h, _ = jax.lax.scan(
            body, h, (stage["blocks"], stage_rates, stage_keys),
            unroll=min(cfg.cnn_scan_unroll, depth_i),
        )
        depth_count += depth_i

    if packed:
        h = convnext_packed.unpack(h, cfg.dims[-1])
    return nn.layer_norm(h, params["final_norm"])
