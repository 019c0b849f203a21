"""Packed (space-to-depth) formulation of the small-channel ConvNeXt stages.

The early stages have C = 4..32 channels; in natural NWC layout the TPU's
128-wide lanes are 3-25% utilized and stage 1 alone costs ~3.5 ms at batch
128 (~60x its FLOPs).  Here every small-C stage runs in a PACKED layout
``(B, L/f, f*C)`` with ``f = 128 // C`` consecutive positions folded into the
lane dimension, so each op is a full-width matmul or elementwise op:

  * stem (conv k=s=5, 2ch) — one block-structured matmul from the
    (B, L/160, 320) patch view (reference model.py:84-100);
  * depthwise conv k=7 SAME — three matmuls against block-Toeplitz matrices
    built per call from the conv taps (current row, previous row, next row);
  * LayerNorm over C — fp32 matmuls against a block-averaging matrix
    (exact mean/var semantics, reference model.py:162);
  * pointwise convs — matmuls against ``kron(I_f, W)``;
  * downsample (LN + conv k=s=2 doubling C) — LN + one block matmul that
    also re-packs to the next stage's ``f' = f/2`` layout.

All matrices are built with ``jnp.kron`` from the live params, so the math
is exactly the reference's (same weights, same adds) with fp32 accumulation
on the MXU.  FLOPs rise by ~C/128 padding waste being converted into useful
lane occupancy; on v5e this trades a lane-starved VPU path for near-peak
MXU work.

Used by models/convnext.cnn_forward for stages with C < 64 when
``cfg.cnn_impl == "pallas"`` and stochastic depth is off (the always-on
reference configuration, model.py:757).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .nn import Params


def _shift_matrix(f: int, delta: int, wrap: int) -> np.ndarray:
    """(f, f) selector: out slot p reads in slot p+delta.

    wrap = 0: only in-range (current row); wrap = -1: slots that underflow
    (read from the PREVIOUS row, i.e. in-slot p+delta+f); wrap = +1: slots
    that overflow into the NEXT row (in-slot p+delta-f)."""
    m = np.zeros((f, f), np.float32)
    for p in range(f):
        src = p + delta
        if wrap == 0 and 0 <= src < f:
            m[src, p] = 1.0
        elif wrap == -1 and src < 0:
            m[src + f, p] = 1.0
        elif wrap == 1 and src >= f:
            m[src - f, p] = 1.0
    return m


def _toeplitz_mats(dw: jax.Array, f: int, kernel_size: int):
    """Depthwise taps (K, C) -> (T_prev, T_cur, T_next), each (f*C, f*C)."""
    c = dw.shape[1]
    half = kernel_size // 2
    mats = []
    for wrap in (-1, 0, 1):
        total = jnp.zeros((f * c, f * c), dw.dtype)
        for j in range(kernel_size):
            s = _shift_matrix(f, j - half, wrap)
            if not s.any():
                continue
            total = total + jnp.kron(jnp.asarray(s, dw.dtype), jnp.diag(dw[j]))
        mats.append(total)
    return mats


def _row_shift(x: jax.Array, delta: int) -> jax.Array:
    """Shift packed rows (axis 1) by delta, zero-filled."""
    if delta == 0:
        return x
    if delta > 0:
        return jnp.pad(x[:, delta:], ((0, 0), (0, delta), (0, 0)))
    return jnp.pad(x[:, :delta], ((0, 0), (-delta, 0), (0, 0)))


def packed_layer_norm(x: jax.Array, p: Params, c: int, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over each C-lane group of the packed (B, R, f*C) tensor,
    computed in fp32 (reference convention)."""
    f = x.shape[-1] // c
    avg = jnp.kron(jnp.eye(f, dtype=jnp.float32), jnp.full((c, c), 1.0 / c, jnp.float32))
    xf = x.astype(jnp.float32)
    mean = xf @ avg
    centered = xf - mean
    var = jnp.square(centered) @ avg
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * jnp.tile(p["scale"].astype(jnp.float32), f) + jnp.tile(
        p["bias"].astype(jnp.float32), f
    )
    return y.astype(x.dtype)


def packed_stem(x: jax.Array, p: Params, f: int, kernel_size: int = 5) -> jax.Array:
    """(B, L, 2) raw audio -> packed (B, L/(k*f), f*C) stage-1 activations,
    stem conv + LN in packed layout."""
    b, length, cin = x.shape
    w = p["conv"]["w"]  # (k, 2, C)
    k, _, c = w.shape
    group = k * f  # input positions per packed output row
    rows = length // group
    patches = x[:, : rows * group, :].reshape(b, rows, group * cin)
    # Block matmul: output lane (c*?) layout (f, C); input lanes (group, cin).
    wmat = jnp.kron(
        jnp.eye(f, dtype=w.dtype), w.reshape(k * cin, c)
    )  # (f*k*cin, f*C)
    out = patches.astype(w.dtype) @ wmat + jnp.tile(p["conv"]["b"], f).astype(w.dtype)
    out = out.astype(x.dtype)
    return packed_layer_norm(out, p["norm"], c)


def packed_block(x: jax.Array, bp: Params, c: int, kernel_size: int = 7) -> jax.Array:
    """One ConvNeXt block in packed layout.  x: (B, R, f*C)."""
    f = x.shape[-1] // c
    dw = bp["depth_conv"]["w"].reshape(kernel_size, c).astype(x.dtype)
    t_prev, t_cur, t_next = _toeplitz_mats(dw, f, kernel_size)
    h = (
        x @ t_cur
        + _row_shift(x, -1) @ t_prev
        + _row_shift(x, 1) @ t_next
        + jnp.tile(bp["depth_conv"]["b"], f).astype(x.dtype)
    )
    h = packed_layer_norm(h, bp["norm"], c)
    hidden = bp["pw1"]["w"].shape[-1]
    w1 = jnp.kron(jnp.eye(f, dtype=x.dtype), bp["pw1"]["w"].astype(x.dtype))
    h1 = h @ w1 + jnp.tile(bp["pw1"]["b"], f).astype(x.dtype)
    h1 = jax.nn.gelu(h1)
    w2 = jnp.kron(jnp.eye(f, dtype=x.dtype), bp["pw2"]["w"].astype(x.dtype))
    h2 = h1 @ w2 + jnp.tile(bp["pw2"]["b"], f).astype(x.dtype)
    out = h2 * jnp.tile(bp["gamma"], f).astype(x.dtype)
    return x + out


def packed_stage_blocks(x: jax.Array, stacked: Params, c: int) -> jax.Array:
    """All blocks of a stage (stacked leading depth axis), unrolled — depths
    here are small (3) and each block's Toeplitz/kron matrices differ.
    Per-block remat mirrors the scanned path's checkpoint policy."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    block = jax.checkpoint(
        packed_block,
        policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        static_argnums=(2,),
    )
    for d in range(depth):
        bp = jax.tree.map(lambda t: t[d], stacked)
        x = block(x, bp, c)
    return x


def packed_downsample(x: jax.Array, p: Params, c_in: int) -> jax.Array:
    """LN + conv k=2 s=2 (C -> 2C), staying packed: (B, R, f*C) ->
    (B, R, (f/2)*(2C)) — the lane count is invariant, rows halve... but the
    packed row covers the same audio span, so rows stay and f halves."""
    f = x.shape[-1] // c_in
    x = packed_layer_norm(x, p["norm"], c_in)
    w = p["conv"]["w"]  # (2, C, 2C)
    c_out = w.shape[-1]
    # Output slot q (of f/2) reads input slots 2q, 2q+1: block matmul
    # (f*C -> (f/2)*2C) built from the (2*C, 2C) patch weight.
    wmat = jnp.kron(
        jnp.eye(f // 2, dtype=w.dtype), w.reshape(2 * c_in, c_out)
    )  # (f*C, (f/2)*2C)
    out = x.astype(w.dtype) @ wmat + jnp.tile(p["conv"]["b"], f // 2).astype(w.dtype)
    return out.astype(x.dtype)


def unpack(x: jax.Array, c: int) -> jax.Array:
    """(B, R, f*C) -> (B, R*f, C) natural layout."""
    b, r, fc = x.shape
    return x.reshape(b, r * (fc // c), c)
