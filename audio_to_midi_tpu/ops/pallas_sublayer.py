"""Fused attention-sublayer kernels: pre-LN + q/kv/k/v projections + RoPE +
attention core + out-projection + residual add, one Pallas kernel per
sublayer (local windowed or global), several samples per grid cell.

Between the bare attention kernels (ops/pallas_attention.py) and the full
pair megakernel (ops/pallas_pair.py — measured slower: too much serial work
per kernel) this is the middle fusion granularity: one sublayer's worth of
ops shares VMEM, so HBM traffic per sublayer drops from ~7 activations to
x-in + x-out, while the projection matmuls still run over (cell * P) rows.

Semantics are the reference's exactly (model.py:377-556): fp32 pre-LN; the
local path's padded-coordinate average/crop quirk; positions restarting per
window via the two-phase decomposition (see pallas_attention.py).

Backward delegates to the XLA sublayer formulation via ``jax.custom_vjp`` in
models/transformer.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_attention import _interpret
from .pallas_pair import _ln_rows, _matmul, _mha, _rope_rows


def _local_sublayer_kernel(
    x_ref, ln_ref, wq_ref, wkv_ref, wk_ref, wv_ref, wo_ref,
    cos_a, sin_a, cos_b, sin_b, o_ref,
    *, num_heads: int, valid_len: int, pad_l: int, window: int,
):
    """x_ref/o_ref: (n, P, D), valid rows at [pad_l, pad_l+valid_len), other
    rows zero (maintained)."""
    n, p_len, d = x_ref.shape
    stride = window // 2
    x = x_ref[...]
    rows = n * p_len

    r_in = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % p_len
    row_valid = (r_in >= pad_l) & (r_in < pad_l + valid_len)
    masked = lambda t: jnp.where(row_valid, t, jnp.zeros_like(t))

    xf = x.reshape(rows, d)
    normed = masked(_ln_rows(xf, ln_ref))
    q = _matmul(normed, wq_ref)
    ckv = _matmul(normed, wkv_ref)
    k = _matmul(ckv, wk_ref)
    v = _matmul(ckv, wv_ref)

    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & band

    col = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (col >= stride) & (col < p_len - stride)
    inv_count = jnp.where(b_rows, 0.5, 1.0).astype(jnp.float32)

    per_sample = []
    for s in range(n):
        sl = slice(s * p_len, (s + 1) * p_len)
        qa = _rope_rows(q[sl], cos_a[:], sin_a[:], num_heads)
        ka = _rope_rows(k[sl], cos_a[:], sin_a[:], num_heads)
        out_a = _mha(qa, ka, v[sl], mask_a, num_heads)
        qb = _rope_rows(q[sl], cos_b[:], sin_b[:], num_heads)
        kb = _rope_rows(k[sl], cos_b[:], sin_b[:], num_heads)
        out_b = _mha(qb, kb, v[sl], mask_b, num_heads)
        out_b = jnp.where(b_rows, out_b, jnp.zeros_like(out_b))
        avg = (
            (out_a.astype(jnp.float32) + out_b.astype(jnp.float32)) * inv_count
        ).astype(out_a.dtype)
        # Padded-coordinate quirk (model.py:453-463): first valid_len rows of
        # the average, re-stored at offset pad_l.
        per_sample.append(
            jnp.pad(avg[:valid_len], ((pad_l, p_len - pad_l - valid_len), (0, 0)))
        )
    r = jnp.concatenate(per_sample, axis=0)
    out = xf + masked(_matmul(r, wo_ref))
    o_ref[...] = out.reshape(n, p_len, d)


def _global_sublayer_kernel(
    x_ref, ln_ref, wq_ref, wkv_ref, wk_ref, wv_ref, wo_ref,
    cos_g, sin_g, o_ref,
    *, num_heads: int, valid_len: int, pad_l: int,
):
    n, p_len, d = x_ref.shape
    x = x_ref[...]
    rows = n * p_len

    r_in = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % p_len
    row_valid = (r_in >= pad_l) & (r_in < pad_l + valid_len)
    masked = lambda t: jnp.where(row_valid, t, jnp.zeros_like(t))

    xf = x.reshape(rows, d)
    normed = masked(_ln_rows(xf, ln_ref))
    q = _matmul(normed, wq_ref)
    ckv = _matmul(normed, wkv_ref)
    k = _matmul(ckv, wk_ref)
    v = _matmul(ckv, wv_ref)
    cg = jnp.tile(cos_g[:], (n, 1))
    sg = jnp.tile(sin_g[:], (n, 1))
    q = _rope_rows(q, cg, sg, num_heads)
    k = _rope_rows(k, cg, sg, num_heads)

    gc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    gmask = (gc >= pad_l) & (gc < pad_l + valid_len)

    per_sample = []
    for s in range(n):
        sl = slice(s * p_len, (s + 1) * p_len)
        per_sample.append(_mha(q[sl], k[sl], v[sl], gmask, num_heads))
    r = jnp.concatenate(per_sample, axis=0)
    out = xf + masked(_matmul(r, wo_ref))
    o_ref[...] = out.reshape(n, p_len, d)


def _cell(batch: int, p_len: int, d: int) -> int:
    for n in (8, 4, 2, 1):
        if batch % n:
            continue
        if n * p_len * d * 2 * 16 <= 12 * 1024 * 1024:
            return n
    return 1


def _call(kernel, xp, weights, tables):
    b, p_len, d = xp.shape
    n = _cell(b, p_len, d)
    xspec = pl.BlockSpec((n, p_len, d), lambda i: (i, 0, 0))
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim) for w in weights]
    tspecs = [pl.BlockSpec(t.shape, lambda i: (0, 0)) for t in tables]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_len, d), xp.dtype),
        grid=(b // n,),
        in_specs=[xspec] + wspecs + tspecs,
        out_specs=xspec,
        interpret=_interpret(),
    )(xp, *weights, *tables)


def fused_local_sublayer(
    xp, weights, tables, *, num_heads: int, valid_len: int, pad_l: int, window: int
):
    """xp: (B, P, D) padded coords.  weights: ln(2,D), wq, wkv, wk, wv, wo.
    tables: cos_a, sin_a, cos_b, sin_b (P, hd//2).  Returns x + sublayer(x)
    in the same padded coords."""
    return _call(
        functools.partial(
            _local_sublayer_kernel,
            num_heads=num_heads, valid_len=valid_len, pad_l=pad_l, window=window,
        ),
        xp, weights, tables,
    )


def fused_global_sublayer(
    xp, weights, tables, *, num_heads: int, valid_len: int, pad_l: int
):
    """Same layout; tables: cos_g, sin_g (P, hd//2) offset by pad_l."""
    return _call(
        functools.partial(
            _global_sublayer_kernel,
            num_heads=num_heads, valid_len=valid_len, pad_l=pad_l,
        ),
        xp, weights, tables,
    )


def sublayer_weights(ln: dict, att: dict, dtype) -> list[jax.Array]:
    return [
        jnp.stack([ln["scale"], ln["bias"]]).astype(jnp.float32),
        att["q_up"]["w"].astype(dtype),
        att["kv_down"]["w"].astype(dtype),
        att["k_up"]["w"].astype(dtype),
        att["v_up"]["w"].astype(dtype),
        att["out"]["w"].astype(dtype),
    ]
