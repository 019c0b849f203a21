"""Fused multi-head attention as a Pallas TPU kernel.

One kernel invocation per (group, head) computes the whole attention core in
VMEM — scaled logits (MXU, fp32 accumulation), length/block masking, fp32
softmax, weighted sum — replacing the XLA path's chain of einsum/cast/softmax
ops and their HBM round-trips.

Two callers (see models/attention.py):
  * global attention: groups = batch, S = 250 padded to 256, length mask;
  * local windowed attention: the (windows, window) axes flatten into one
    sequence of W*16 rows with a BLOCK-DIAGONAL mask (block = window size), so
    all 31 overlapping windows of a sample run as one MXU-shaped matmul
    instead of 31 tiny ones — arithmetically identical to per-window softmax
    because masked logits are -inf outside each block.

The backward pass is delegated to the XLA formulation via ``jax.custom_vjp``
(rematerializing q/k/v), so training through this kernel is exact.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET_PLATFORMS = ("cpu",)


def _interpret() -> bool:
    return jax.default_backend() in _INTERPRET_PLATFORMS


def _attention_kernel(
    q_ref, k_ref, v_ref, o_ref, *, valid_len: int, seg: int, block: int
):
    """q/k/v refs: (1, h_per, seg, hd) VMEM blocks; o: same.

    The h_per head segments are flattened into one (h_per*seg, hd) row axis
    and isolated from each other by the same block-diagonal masking that
    implements per-window attention (block divides seg, so windows never
    cross a head boundary) — one MXU-shaped matmul instead of many small
    ones.  Dots keep their native (bf16) input dtype with fp32 accumulation —
    an fp32-input dot would run at a fraction of MXU throughput.
    """
    _, h_per, s, hd = q_ref.shape
    n = h_per * s
    q = q_ref[0].reshape(n, hd) * jnp.asarray(1.0 / math.sqrt(hd), q_ref.dtype)
    k = k_ref[0].reshape(n, hd)
    v = v_ref[0].reshape(n, hd)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (n, n) fp32

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = (rows // block == cols // block) & (cols % seg < valid_len)
    logits = jnp.where(mask, logits, -1e30)

    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.reshape(h_per, s, hd).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_kernel_nhd(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, valid_len: int, block: int
):
    """Natural-layout kernel: refs are (1, S, H*hd) — the exact layout the
    projection matmuls produce, so XLA inserts NO relayout copies around the
    kernel (the per-head slicing happens in VMEM instead).  Heads are a
    static python loop; logits scratch is reused by XLA across iterations."""
    _, s, dmodel = q_ref.shape
    hd = dmodel // num_heads
    scale = jnp.asarray(1.0 / math.sqrt(hd), q_ref.dtype)

    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = cols < valid_len
    if block > 0:
        mask = mask & (rows // block == cols // block)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # A banded variant (row tiles attending only their own column tile) was
    # measured and reverted: the kernel is not FLOP-bound at these sizes, and
    # the extra small matmuls pipelined worse than one full masked dot.
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def fused_attention_nhd(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int, block: int = 0
):
    """Fused attention over natural (G, S, H*hd) layout (no transposes).

    ``block`` > 0 applies the block-diagonal window mask.  Not differentiable
    (used on dropout-free inference paths; _attend handles grad fallback).
    """
    g, s, dmodel = q.shape
    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = pl.BlockSpec((1, s_pad, dmodel), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel_nhd, num_heads=num_heads, valid_len=s, block=block
        ),
        out_shape=jax.ShapeDtypeStruct((g, s_pad, dmodel), q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(q, k, v)
    return out[:, :s, :]


_LOGITS_VMEM_BUDGET = 6 * 1024 * 1024  # fp32 logits tile cap per kernel cell


def _fused_attention_impl(q: jax.Array, k: jax.Array, v: jax.Array, block: int):
    """q/k/v: (G, H, S, hd) -> (G, H, S, hd)."""
    g, h, s, hd = q.shape
    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # Pack as many heads per cell as the fp32 logits tile allows.
    h_per = h
    while h_per > 1 and (
        (h_per * s_pad) ** 2 * 4 > _LOGITS_VMEM_BUDGET or h % h_per != 0
    ):
        h_per -= 1

    # block == 0 (global attention) degenerates to per-head-segment blocks.
    eff_block = block if block > 0 else s_pad
    assert s_pad % eff_block == 0, (s_pad, eff_block)

    spec = pl.BlockSpec((1, h_per, s_pad, hd), lambda i, j: (i, j, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, valid_len=s, seg=s_pad, block=eff_block
        ),
        out_shape=jax.ShapeDtypeStruct((g, h, s_pad, hd), q.dtype),
        grid=(g, h // h_per),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(q, k, v)
    return out[:, :, :s, :]


def _xla_reference(q, k, v, block: int):
    """XLA formulation with identical masking (backward + fallback path)."""
    hd = q.shape[-1]
    s = q.shape[-2]
    qs = q.astype(jnp.float32) / math.sqrt(hd)
    logits = jnp.einsum("ghsd,ghSd->ghsS", qs, k.astype(jnp.float32))
    if block > 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where(rows // block == cols // block, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("ghsS,ghSd->ghsd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, block: int = 0):
    """Fused attention over (G, H, S, hd); ``block`` > 0 applies a
    block-diagonal mask (local windowed attention)."""
    return _fused_attention_impl(q, k, v, block)


def _fwd(q, k, v, block):
    return _fused_attention_impl(q, k, v, block), (q, k, v)


def _bwd(block, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, block), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_nhd_diff(q, k, v, num_heads: int, block: int):
    """Differentiable wrapper over the natural-layout kernel; backward runs
    the XLA formulation (rematerialized)."""
    return fused_attention_nhd(q, k, v, num_heads, block)


def _nhd_to_ghsd(x, num_heads):
    g, s, dm = x.shape
    return jnp.transpose(x.reshape(g, s, num_heads, dm // num_heads), (0, 2, 1, 3))


def _ghsd_to_nhd(x):
    g, h, s, hd = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(g, s, h * hd)


def _fwd_nhd(q, k, v, num_heads, block):
    return fused_attention_nhd(q, k, v, num_heads, block), (q, k, v)


def _bwd_nhd(num_heads, block, residuals, g):
    q, k, v = residuals

    def ref(q, k, v):
        out = _xla_reference(
            _nhd_to_ghsd(q, num_heads),
            _nhd_to_ghsd(k, num_heads),
            _nhd_to_ghsd(v, num_heads),
            block,
        )
        return _ghsd_to_nhd(out)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


fused_attention_nhd_diff.defvjp(_fwd_nhd, _bwd_nhd)
