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


def _nhd_core(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, valid_len: int, block: int,
    get_bits=None, threshold: int = 0,
):
    """Natural-layout attention core: refs are (1, S, H*hd) — the exact
    layout the projection matmuls produce, so XLA inserts NO relayout copies
    around the kernel (the per-head slicing happens in VMEM instead).  Heads
    are a static python loop; logits scratch is reused by XLA across
    iterations.

    ``get_bits(h) -> (S, S) int32 low-byte bits`` optionally applies
    attention-weight dropout to head h's fp32 softmax weights — the ONE body
    is shared by the dropout-free, precomputed-bits, and hardware-PRNG kernel
    wrappers (get_bits=None traces exactly the dropout-free program)."""
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
    # Heads are software-pipelined at distance 1 (next head's logits matmul
    # before this head's softmax) to overlap MXU and VPU work.
    def logits_of(h):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(mask, logits, -1e30)

    pending = logits_of(0)
    for h in range(num_heads):
        nxt = logits_of(h + 1) if h + 1 < num_heads else None
        weights = jax.nn.softmax(pending, axis=-1)
        if get_bits is not None:
            weights = _apply_bits(weights, get_bits(h), threshold)
        weights = weights.astype(v.dtype)
        sl = slice(h * hd, (h + 1) * hd)
        out = jax.lax.dot_general(
            weights, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)
        pending = nxt


def _attention_kernel_nhd(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, valid_len: int, block: int
):
    _nhd_core(
        q_ref, k_ref, v_ref, o_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
    )


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
    if _use_bwd_kernel():
        return nhd_grads(q, k, v, g, num_heads, block, valid_len=q.shape[1])

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


# ---------------------------------------------------------------------------
# Attention-weight dropout inside the kernels.
#
# The reference's production config trains with attention-weight dropout 0.1
# (model.py:31, applied to the fp32 softmax weights before the V matmul,
# model.py:253-257).  Materializing weights for host-side dropout forced the
# whole attention onto the XLA einsum path (97.6 vs 59.8 ms/step, PERF.md
# round 2).  Here the dropout mask rides into the kernel as PRECOMPUTED uint8
# random bits (1 byte per logit): the kernel keeps weight (r, c) iff
# bits[r, c] >= threshold, scaling kept weights by 1/keep — inverted dropout
# with rate threshold/256 (rate quantized to 1/256 steps; 0.1 -> 26/256 =
# 0.1016, irrelevant for training and asserted by the statistical test).
# The backward pass applies the SAME bits in the XLA mirror, so gradients are
# exact w.r.t. the identical mask — testable bit-for-bit.
# ---------------------------------------------------------------------------


def dropout_threshold(rate: float) -> int:
    """uint8 threshold whose drop rate best approximates ``rate``."""
    return int(round(rate * 256.0))


def mosaic_dtype_ok(dtype) -> bool:
    """Mosaic (Pallas TPU) rejects f16 ("Unsupported type in mosaic dialect:
    'f16'"), so the f16 loss-scaling precision policy must take the XLA
    attention paths.  Every kernel-dispatch gate checks this."""
    return jnp.dtype(dtype) != jnp.float16


def random_bits_fast(key, shape) -> jax.Array:
    """uint8 random bits via the TPU hardware RNG (rbg).

    Dropout needs hundreds of MB of bits per training step (regenerated in
    the remat replay); threefry generates them in VPU arithmetic while rbg
    uses the hardware PRNG instruction.  The threefry ``key`` is folded into
    rbg key data, so streams stay keyed; bit quality is ample for dropout.
    Falls back to threefry where rbg is unavailable.
    """
    try:
        data = jax.random.bits(key, (4,), dtype=jnp.uint32)
        rbg_key = jax.random.wrap_key_data(data, impl="rbg")
        return jax.random.bits(rbg_key, shape, dtype=jnp.uint8)
    except Exception:  # pragma: no cover - impl not registered
        return jax.random.bits(key, shape, dtype=jnp.uint8)


def _apply_bits(weights_f32, bits, threshold: int):
    """weights: fp32; bits: uint8 same shape.  Inverted dropout.

    The comparison runs in int32 — Mosaic's v5e target rejects unsigned i8
    vector compares ("Target does not support this comparison")."""
    if not 0 < threshold < 256:
        raise ValueError(
            f"dropout threshold {threshold} out of (0, 256): rate quantizes "
            "to keep-nothing/keep-all; route such configs to the XLA path"
        )
    keep_inv = jnp.float32(256.0 / (256.0 - threshold))
    keep = bits.astype(jnp.int32) >= jnp.int32(threshold)
    return jnp.where(keep, weights_f32 * keep_inv, 0.0)


def _attention_kernel_nhd_drop(
    q_ref, k_ref, v_ref, bits_ref, o_ref,
    *, num_heads: int, valid_len: int, block: int, threshold: int,
):
    """`_nhd_core` with precomputed dropout bits (1, H, S, S) uint8
    (reference dropout position model.py:253-257)."""
    _nhd_core(
        q_ref, k_ref, v_ref, o_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
        get_bits=lambda h: bits_ref[0, h], threshold=threshold,
    )


def _xla_reference_nhd_bits(q, k, v, bits, num_heads, block, threshold, valid_len):
    """XLA mirror with the identical bits mask (backward + grad tests).
    q/k/v: (G, S, H*hd); bits: (G, H, S, S) uint8."""
    g, s, dm = q.shape
    hd = dm // num_heads
    qh = q.reshape(g, s, num_heads, hd).astype(jnp.float32) / math.sqrt(hd)
    kh = k.reshape(g, s, num_heads, hd).astype(jnp.float32)
    vh = v.reshape(g, s, num_heads, hd).astype(jnp.float32)
    logits = jnp.einsum("gshd,gShd->ghsS", qh, kh)
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = cols < valid_len
    if block > 0:
        mask = mask & (rows // block == cols // block)
    logits = jnp.where(mask, logits, -1e30)
    weights = _apply_bits(jax.nn.softmax(logits, axis=-1), bits, threshold)
    out = jnp.einsum("ghsS,gShd->gshd", weights.astype(q.dtype), vh.astype(q.dtype))
    return out.reshape(g, s, dm).astype(q.dtype)


def _zero_bits_cotangent(bits):
    import numpy as np

    return np.zeros(bits.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attention_nhd_dropout(
    q, k, v, bits, num_heads: int, block: int, threshold: int, valid_len: int
):
    """Natural-layout fused attention with attention-weight dropout.

    q/k/v: (G, S, H*hd) with S already padded to the kernel tile (the caller
    pads and crops); bits: (G, H, S, S) uint8 random bits; ``valid_len``
    masks the padded columns exactly as the dropout-free kernel does.
    """
    g, s, dm = q.shape
    spec = pl.BlockSpec((1, s, dm), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((1, num_heads, s, s), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _attention_kernel_nhd_drop,
            num_heads=num_heads, valid_len=valid_len, block=block,
            threshold=threshold,
        ),
        out_shape=jax.ShapeDtypeStruct((g, s, dm), q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        interpret=_interpret(),
    )(q, k, v, bits)


def _drop_nhd_fwd(q, k, v, bits, num_heads, block, threshold, valid_len):
    out = fused_attention_nhd_dropout(
        q, k, v, bits, num_heads, block, threshold, valid_len
    )
    return out, (q, k, v, bits)


def _drop_nhd_bwd(num_heads, block, threshold, valid_len, residuals, g):
    q, k, v, bits = residuals
    if _use_bwd_kernel():
        dq, dk, dv = nhd_grads(
            q, k, v, g, num_heads, block, valid_len=valid_len,
            bits=bits, threshold=threshold,
        )
        return dq, dk, dv, _zero_bits_cotangent(bits)
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_nhd_bits(
            q, k, v, bits, num_heads, block, threshold, valid_len=valid_len
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, _zero_bits_cotangent(bits)


fused_attention_nhd_dropout.defvjp(_drop_nhd_fwd, _drop_nhd_bwd)


def attend_nhd_dropout(
    q, k, v, key, num_heads: int, rate: float, block: int = 0
) -> jax.Array:
    """Pad + generate bits + run the dropout kernel + crop.

    q/k/v: (G, S, H*hd) natural layout; ``key`` drives the uint8 bits whose
    thresholding realizes attention-weight dropout at rate
    ``round(rate*256)/256``.
    """
    threshold = dropout_threshold(rate)
    g, s, dm = q.shape
    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if prng_dropout_available():
        out = fused_attention_nhd_dropout_prng(
            q, k, v, seed_from_key(key), num_heads, block, threshold, s
        )
    else:
        bits = random_bits_fast(key, (g, num_heads, s_pad, s_pad))
        out = fused_attention_nhd_dropout(
            q, k, v, bits, num_heads, block, threshold, s
        )
    return out[:, :s, :]


# ---------------------------------------------------------------------------
# Two-phase local (sliding-window) attention.
#
# The reference's stride-8/window-16 sliding windows (model.py:377-471)
# partition into two NON-overlapping sets: phase A windows start at 0, w,
# 2w, … (a plain block-diagonal-w mask on the padded rows); phase B windows
# start at w/2, 3w/2, … (the same mask shifted by w/2, covering rows
# [w/2, P-w/2)).  Every row lies in exactly one window per phase, so the
# reference's overlap-average over windows is exactly (outA + outB) / count
# with count = 2 on [w/2, P-w/2) and 1 at the edges.  This needs NO windowed
# gather/scatter, projects q/k/v on the original rows (phase-specific RoPE
# tables restart positions per window), and computes P^2 masked logits per
# phase instead of (2P)^2 for the flattened-windows formulation.
# ---------------------------------------------------------------------------


def _two_phase_core(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref,
    *, num_heads: int, window: int, get_bits=None, threshold: int = 0,
):
    """Two-phase local attention core: refs (n, P, H*hd).  Output: the
    overlap-averaged local attention in padded coordinates.

    The (sample, phase, head) attention cores are software-pipelined at
    distance 1 — the NEXT core's logits matmul issues before the current
    core's softmax/out — so the MXU keeps streaming while the VPU runs the
    fp32 softmax (measured ~10% on v5e vs strictly sequential cores).

    ``get_bits(s, ph, h) -> (P, P) int32 low-byte bits`` optionally applies
    attention-weight dropout (each original window lies in exactly one
    phase, so per-window weights drop independently like the reference's
    per-window dropout, model.py:253-257) — the ONE body is shared by the
    dropout-free, precomputed-bits, and hardware-PRNG kernel wrappers
    (get_bits=None traces exactly the dropout-free program)."""
    n, p_len, dm = qa_ref.shape
    hd = dm // num_heads
    stride = window // 2
    scale = jnp.asarray(1.0 / math.sqrt(hd), qa_ref.dtype)

    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    in_band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & in_band

    col = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (col >= stride) & (col < p_len - stride)
    inv_count = jnp.where(b_rows, 0.5, 1.0).astype(jnp.float32)

    work = [(s, ph, h) for s in range(n) for ph in range(2) for h in range(num_heads)]

    def logits_of(i):
        s, ph, h = work[i]
        q_ref, k_ref = ((qa_ref, ka_ref), (qb_ref, kb_ref))[ph]
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q_ref[s][:, sl] * scale, k_ref[s][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(mask_a if ph == 0 else mask_b, logits, -1e30)

    outs = {}
    pending = logits_of(0)
    for i, (s, ph, h) in enumerate(work):
        nxt = logits_of(i + 1) if i + 1 < len(work) else None
        weights = jax.nn.softmax(pending, axis=-1)
        if get_bits is not None:
            weights = _apply_bits(weights, get_bits(s, ph, h), threshold)
        weights = weights.astype(v_ref.dtype)
        sl = slice(h * hd, (h + 1) * hd)
        outs[(s, ph, h)] = jax.lax.dot_general(
            weights, v_ref[s][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pending = nxt

    for s in range(n):
        out_a = jnp.concatenate([outs[(s, 0, h)] for h in range(num_heads)], axis=-1)
        out_b = jnp.concatenate([outs[(s, 1, h)] for h in range(num_heads)], axis=-1)
        out_b = jnp.where(b_rows, out_b, jnp.zeros_like(out_b))
        o_ref[s] = ((out_a + out_b) * inv_count).astype(o_ref.dtype)


def _two_phase_kernel(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref, *, num_heads: int, window: int
):
    _two_phase_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref,
        num_heads=num_heads, window=window,
    )


def _two_phase_cell(batch: int, p_len: int, dm: int) -> int:
    for n in (8, 4, 2, 1):
        if batch % n:
            continue
        if n * p_len * dm * 2 * 14 <= 12 * 1024 * 1024:
            return n
    return 1


def _two_phase_impl(qa, ka, qb, kb, v, num_heads: int, window: int):
    b, p_len, dm = qa.shape
    n = _two_phase_cell(b, p_len, dm)
    spec = pl.BlockSpec((n, p_len, dm), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_two_phase_kernel, num_heads=num_heads, window=window),
        out_shape=jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype),
        grid=(b // n,),
        in_specs=[spec] * 5,
        out_specs=spec,
        interpret=_interpret(),
    )(qa, ka, qb, kb, v)


def _two_phase_reference(qa, ka, qb, kb, v, num_heads: int, window: int):
    """jnp mirror of the two-phase kernel (backward + golden tests)."""
    b, p_len, dm = qa.shape
    hd = dm // num_heads
    stride = window // 2

    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    in_band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & in_band

    def mha(q, k, mask):
        qh = q.reshape(b, p_len, num_heads, hd).astype(jnp.float32) / math.sqrt(hd)
        kh = k.reshape(b, p_len, num_heads, hd).astype(jnp.float32)
        vh = v.reshape(b, p_len, num_heads, hd).astype(jnp.float32)
        logits = jnp.einsum("bshd,bShd->bhsS", qh, kh)
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhsS,bShd->bshd", weights, vh).reshape(b, p_len, dm)

    out_a = mha(qa, ka, mask_a)
    out_b = mha(qb, kb, mask_b)
    rows = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (rows >= stride) & (rows < p_len - stride)
    out_b = jnp.where(b_rows, out_b, jnp.zeros_like(out_b))
    inv = jnp.where(b_rows, 0.5, 1.0)
    return ((out_a + out_b) * inv).astype(qa.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_local_two_phase(qa, ka, qb, kb, v, num_heads: int, window: int):
    """Two-phase sliding-window attention with overlap averaging.

    qa/ka: phase-A roped q/k; qb/kb: phase-B roped q/k; v shared.
    All (B, P, H*hd) with P divisible by ``window``.  Returns the averaged
    window-attention output in padded coordinates (B, P, H*hd)."""
    return _two_phase_impl(qa, ka, qb, kb, v, num_heads, window)


def _two_phase_fwd(qa, ka, qb, kb, v, num_heads, window):
    out = _two_phase_impl(qa, ka, qb, kb, v, num_heads, window)
    return out, (qa, ka, qb, kb, v)


def _two_phase_bwd(num_heads, window, residuals, g):
    qa, ka, qb, kb, v = residuals
    if _use_bwd_kernel():
        return two_phase_grads(qa, ka, qb, kb, v, g, num_heads, window)
    _, vjp = jax.vjp(
        lambda *a: _two_phase_reference(*a, num_heads=num_heads, window=window),
        qa, ka, qb, kb, v,
    )
    return vjp(g)


fused_local_two_phase.defvjp(_two_phase_fwd, _two_phase_bwd)


def _two_phase_kernel_drop(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, bits_a_ref, bits_b_ref, o_ref,
    *, num_heads: int, window: int, threshold: int,
):
    """`_two_phase_core` with precomputed per-phase dropout bits
    (n, H, P, P) uint8."""
    _two_phase_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref,
        num_heads=num_heads, window=window,
        get_bits=lambda s, ph, h: (bits_a_ref if ph == 0 else bits_b_ref)[s, h],
        threshold=threshold,
    )


def _two_phase_cell_drop(batch: int, p_len: int, dm: int, num_heads: int) -> int:
    for n in (8, 4, 2, 1):
        if batch % n:
            continue
        act = n * p_len * dm * 2 * 14
        bits = n * 2 * num_heads * p_len * p_len  # uint8 per phase
        if act + bits <= 12 * 1024 * 1024:
            return n
    return 1


def _two_phase_reference_bits(
    qa, ka, qb, kb, v, bits_a, bits_b, num_heads: int, window: int, threshold: int
):
    """jnp mirror of the dropout two-phase kernel with the identical bits
    (backward + grad-exactness tests).  bits: (B, H, P, P) uint8 per phase."""
    b, p_len, dm = qa.shape
    hd = dm // num_heads
    stride = window // 2

    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    in_band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & in_band

    def mha(q, k, mask, bits):
        qh = q.reshape(b, p_len, num_heads, hd).astype(jnp.float32) / math.sqrt(hd)
        kh = k.reshape(b, p_len, num_heads, hd).astype(jnp.float32)
        vh = v.reshape(b, p_len, num_heads, hd).astype(jnp.float32)
        logits = jnp.einsum("bshd,bShd->bhsS", qh, kh)
        logits = jnp.where(mask, logits, -1e30)
        weights = _apply_bits(jax.nn.softmax(logits, axis=-1), bits, threshold)
        return jnp.einsum(
            "bhsS,bShd->bshd", weights.astype(qa.dtype).astype(jnp.float32), vh
        ).reshape(b, p_len, dm)

    out_a = mha(qa, ka, mask_a, bits_a)
    out_b = mha(qb, kb, mask_b, bits_b)
    rows = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (rows >= stride) & (rows < p_len - stride)
    out_b = jnp.where(b_rows, out_b, jnp.zeros_like(out_b))
    inv = jnp.where(b_rows, 0.5, 1.0)
    return ((out_a + out_b) * inv).astype(qa.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_local_two_phase_dropout(
    qa, ka, qb, kb, v, bits_a, bits_b, num_heads: int, window: int, threshold: int
):
    """Two-phase sliding-window attention + overlap averaging with in-kernel
    attention-weight dropout (bits per phase, (B, H, P, P) uint8)."""
    b, p_len, dm = qa.shape
    n = _two_phase_cell_drop(b, p_len, dm, num_heads)
    spec = pl.BlockSpec((n, p_len, dm), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((n, num_heads, p_len, p_len), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _two_phase_kernel_drop,
            num_heads=num_heads, window=window, threshold=threshold,
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype),
        grid=(b // n,),
        in_specs=[spec] * 5 + [bspec, bspec],
        out_specs=spec,
        interpret=_interpret(),
    )(qa, ka, qb, kb, v, bits_a, bits_b)


def _two_phase_drop_fwd(qa, ka, qb, kb, v, bits_a, bits_b, num_heads, window, threshold):
    out = fused_local_two_phase_dropout(
        qa, ka, qb, kb, v, bits_a, bits_b, num_heads, window, threshold
    )
    return out, (qa, ka, qb, kb, v, bits_a, bits_b)


def _two_phase_drop_bwd(num_heads, window, threshold, residuals, g):
    qa, ka, qb, kb, v, bits_a, bits_b = residuals
    if _use_bwd_kernel():
        grads = two_phase_grads_drop(
            qa, ka, qb, kb, v, bits_a, bits_b, g, num_heads, window, threshold
        )
        return (*grads, _zero_bits_cotangent(bits_a), _zero_bits_cotangent(bits_b))
    _, vjp = jax.vjp(
        lambda *a: _two_phase_reference_bits(
            *a, bits_a, bits_b, num_heads=num_heads, window=window,
            threshold=threshold,
        ),
        qa, ka, qb, kb, v,
    )
    grads = vjp(g)
    return (*grads, _zero_bits_cotangent(bits_a), _zero_bits_cotangent(bits_b))


fused_local_two_phase_dropout.defvjp(_two_phase_drop_fwd, _two_phase_drop_bwd)


# ---------------------------------------------------------------------------
# Reduced-width two-phase local attention: local rows attend exactly
# ``window`` (16) keys, so instead of one full masked (P, P) logits matmul per
# core, each window's (16, hd) q/k produce a (16, 16) tile and the softmax
# runs over (P, window) — logits FLOPs and softmax VPU work both drop ~16x at
# P=256.  The trade: 2*(P/window) small MXU dots per core instead of 2 large
# ones (the banding experiment showed these kernels are op-count-bound, so
# this must be MEASURED, not assumed — see PERF.md).
#
# Phase B (windows offset by stride) is made structurally identical to phase A
# by rolling its rows up by ``stride`` before the blocked cores and rolling
# the output back; the wrapped window's rows land outside the phase-B band
# and are zeroed by the same b_rows mask the wide kernel uses.
# ---------------------------------------------------------------------------


def _roll_up(x, s: int):
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _roll_down(x, s: int):
    return jnp.concatenate([x[-s:], x[:-s]], axis=0)


def _blocked_local_core(q, k, v, window: int, scale):
    """q/k/v: (P, hd) of ONE head, block-diagonal window attention with
    (P, window) logits.  Returns (P, hd) fp32."""
    p_len, hd = q.shape
    nw = p_len // window
    tiles = []
    for w in range(nw):
        sl = slice(w * window, (w + 1) * window)
        tiles.append(
            jax.lax.dot_general(
                q[sl] * scale, k[sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    logits = jnp.concatenate(tiles, axis=0)  # (P, window) fp32
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    outs = []
    for w in range(nw):
        sl = slice(w * window, (w + 1) * window)
        outs.append(
            jax.lax.dot_general(
                weights[sl], v[sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=0)


def _two_phase_kernel_rw(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref, *, num_heads: int, window: int
):
    """Reduced-width variant of ``_two_phase_kernel`` — identical math."""
    n, p_len, dm = qa_ref.shape
    hd = dm // num_heads
    stride = window // 2
    scale = jnp.asarray(1.0 / math.sqrt(hd), qa_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (col >= stride) & (col < p_len - stride)
    inv_count = jnp.where(b_rows, 0.5, 1.0).astype(jnp.float32)

    for s in range(n):
        v = v_ref[s]
        vb = _roll_up(v, stride)
        qb = _roll_up(qb_ref[s], stride)
        kb = _roll_up(kb_ref[s], stride)
        heads_a, heads_b = [], []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            heads_a.append(
                _blocked_local_core(qa_ref[s][:, sl], ka_ref[s][:, sl], v[:, sl], window, scale)
            )
            heads_b.append(
                _blocked_local_core(qb[:, sl], kb[:, sl], vb[:, sl], window, scale)
            )
        out_a = jnp.concatenate(heads_a, axis=-1)
        out_b = _roll_down(jnp.concatenate(heads_b, axis=-1), stride)
        out_b = jnp.where(b_rows, out_b, jnp.zeros_like(out_b))
        o_ref[s] = ((out_a + out_b) * inv_count).astype(o_ref.dtype)


def _two_phase_rw_impl(qa, ka, qb, kb, v, num_heads: int, window: int):
    b, p_len, dm = qa.shape
    n = _two_phase_cell(b, p_len, dm)
    spec = pl.BlockSpec((n, p_len, dm), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_two_phase_kernel_rw, num_heads=num_heads, window=window),
        out_shape=jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype),
        grid=(b // n,),
        in_specs=[spec] * 5,
        out_specs=spec,
        interpret=_interpret(),
    )(qa, ka, qb, kb, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_local_two_phase_rw(qa, ka, qb, kb, v, num_heads: int, window: int):
    """Reduced-width two-phase local attention (same contract as
    ``fused_local_two_phase``; selected via attention_impl="pallas_rw")."""
    return _two_phase_rw_impl(qa, ka, qb, kb, v, num_heads, window)


def _two_phase_rw_fwd(qa, ka, qb, kb, v, num_heads, window):
    return _two_phase_rw_impl(qa, ka, qb, kb, v, num_heads, window), (qa, ka, qb, kb, v)


fused_local_two_phase_rw.defvjp(_two_phase_rw_fwd, _two_phase_bwd)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernels for the attention cores.
#
# The custom_vjp backward used to delegate to the XLA mirror, which
# materializes the (B, H, P, P) weights through HBM several times — under
# remat the training step is backward-dominated, so the forward kernels alone
# barely moved the step time (PERF.md round 3).  These kernels compute
# dq/dk/dv per core entirely in VMEM: recompute logits+softmax (cheaper than
# storing weights), then dv = w^T g, dw = g v^T, dlogits = w*(dw - rowsum),
# dq = dlogits k, dk = dlogits^T q.  Math identical to jax.vjp of the XLA
# mirror (tests assert allclose).  Disable with A2M_PALLAS_BWD=0.
# ---------------------------------------------------------------------------

import os as _os


def _use_bwd_kernel() -> bool:
    return _os.environ.get("A2M_PALLAS_BWD", "1") != "0"


def _core_grads(q, k, v, do, mask, scale, bits=None, threshold: int = 0):
    """One attention core's input grads, all fp32 in VMEM.

    q/k/v: (P, hd) compute dtype; do: (P, hd) fp32; mask: (P, P) bool.
    Returns (dq, dk, dv) fp32.  ``bits`` applies the in-kernel dropout mask
    exactly as the forward did.
    """
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)  # (P, P) fp32
    if bits is not None:
        w_used = _apply_bits(w, bits, threshold)
    else:
        w_used = w
    # Forward cast w to the V dtype before the V matmul — reproduce for
    # exactness of dv and dw w.r.t. the mirror.
    w_cast = w_used.astype(v.dtype)
    dv = jax.lax.dot_general(
        w_cast, do.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bits is not None:
        dw = _apply_bits(dw, bits, threshold)
    dlogits = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dlogits = jnp.where(mask, dlogits, 0.0).astype(q.dtype)
    dq = jax.lax.dot_general(
        dlogits, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale.astype(jnp.float32)
    dk = jax.lax.dot_general(
        dlogits, q * scale, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _two_phase_bwd_core(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
    dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
    *, num_heads: int, window: int, get_bits=None, threshold: int = 0,
):
    """Backward of the two-phase local attention: refs (n, P, H*hd); g is the
    cotangent of the overlap-averaged output.  ``get_bits(s, ph, h)``
    optionally supplies the SAME dropout bits the forward applied (shared by
    the dropout-free, precomputed-bits, and hardware-PRNG wrappers)."""
    n, p_len, dm = qa_ref.shape
    hd = dm // num_heads
    stride = window // 2
    scale = jnp.asarray(1.0 / math.sqrt(hd), qa_ref.dtype)

    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    in_band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & in_band

    col = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (col >= stride) & (col < p_len - stride)
    inv_count = jnp.where(b_rows, 0.5, 1.0).astype(jnp.float32)

    for s in range(n):
        g = g_ref[s].astype(jnp.float32) * inv_count
        g_b = jnp.where(b_rows, g, 0.0)
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            dqa, dka, dva = _core_grads(
                qa_ref[s][:, sl], ka_ref[s][:, sl], v_ref[s][:, sl],
                g[:, sl], mask_a, scale,
                bits=None if get_bits is None else get_bits(s, 0, h),
                threshold=threshold,
            )
            dqb, dkb, dvb = _core_grads(
                qb_ref[s][:, sl], kb_ref[s][:, sl], v_ref[s][:, sl],
                g_b[:, sl], mask_b, scale,
                bits=None if get_bits is None else get_bits(s, 1, h),
                threshold=threshold,
            )
            dqa_ref[s, :, sl] = dqa.astype(dqa_ref.dtype)
            dka_ref[s, :, sl] = dka.astype(dka_ref.dtype)
            dqb_ref[s, :, sl] = dqb.astype(dqb_ref.dtype)
            dkb_ref[s, :, sl] = dkb.astype(dkb_ref.dtype)
            dv_ref[s, :, sl] = (dva + dvb).astype(dv_ref.dtype)


def _two_phase_bwd_kernel(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
    dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
    *, num_heads: int, window: int,
):
    _two_phase_bwd_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
        dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
        num_heads=num_heads, window=window,
    )


def _two_phase_bwd_cell(batch: int, p_len: int, dm: int) -> int:
    for n in (4, 2, 1):
        if batch % n:
            continue
        if n * p_len * dm * 2 * 24 <= 12 * 1024 * 1024:
            return n
    return 1


def two_phase_grads(qa, ka, qb, kb, v, g, num_heads: int, window: int):
    """(dqa, dka, dqb, dkb, dv) via the backward kernel."""
    b, p_len, dm = qa.shape
    n = _two_phase_bwd_cell(b, p_len, dm)
    spec = pl.BlockSpec((n, p_len, dm), lambda i: (i, 0, 0))
    shapes = [jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype)] * 5
    return pl.pallas_call(
        functools.partial(
            _two_phase_bwd_kernel, num_heads=num_heads, window=window
        ),
        out_shape=shapes,
        grid=(b // n,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 5,
        interpret=_interpret(),
    )(qa, ka, qb, kb, v, g)


def _two_phase_bwd_kernel_drop(
    qa_ref, ka_ref, qb_ref, kb_ref, v_ref, bits_a_ref, bits_b_ref, g_ref,
    dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
    *, num_heads: int, window: int, threshold: int,
):
    """`_two_phase_bwd_core` with precomputed per-phase bits (n, H, P, P)."""
    _two_phase_bwd_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
        dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
        num_heads=num_heads, window=window,
        get_bits=lambda s, ph, h: (bits_a_ref if ph == 0 else bits_b_ref)[s, h],
        threshold=threshold,
    )


def two_phase_grads_drop(
    qa, ka, qb, kb, v, bits_a, bits_b, g, num_heads: int, window: int, threshold: int
):
    b, p_len, dm = qa.shape
    n = _two_phase_bwd_cell(b, p_len, dm)
    while n > 1 and n * 2 * num_heads * p_len * p_len > 4 * 1024 * 1024:
        n //= 2  # bits blocks share the VMEM budget
    spec = pl.BlockSpec((n, p_len, dm), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((n, num_heads, p_len, p_len), lambda i: (i, 0, 0, 0))
    shapes = [jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype)] * 5
    return pl.pallas_call(
        functools.partial(
            _two_phase_bwd_kernel_drop,
            num_heads=num_heads, window=window, threshold=threshold,
        ),
        out_shape=shapes,
        grid=(b // n,),
        in_specs=[spec] * 5 + [bspec, bspec, spec],
        out_specs=[spec] * 5,
        interpret=_interpret(),
    )(qa, ka, qb, kb, v, bits_a, bits_b, g)


def _nhd_bwd_core(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, valid_len: int, block: int,
    get_bits=None, threshold: int = 0,
):
    """Backward of the natural-layout kernel; refs (1, S, H*hd).
    ``get_bits(h)`` optionally supplies the forward's dropout bits (shared
    by the dropout-free, precomputed-bits, and hardware-PRNG wrappers)."""
    _, s, dm = q_ref.shape
    hd = dm // num_heads
    scale = jnp.asarray(1.0 / math.sqrt(hd), q_ref.dtype)

    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = cols < valid_len
    if block > 0:
        mask = mask & (rows // block == cols // block)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        dq, dk, dv = _core_grads(
            q[:, sl], k[:, sl], v[:, sl], g[:, sl], mask, scale,
            bits=None if get_bits is None else get_bits(h),
            threshold=threshold,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _nhd_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, valid_len: int, block: int,
):
    _nhd_bwd_core(
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
    )


def _nhd_bwd_kernel_drop(
    q_ref, k_ref, v_ref, bits_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, valid_len: int, block: int, threshold: int,
):
    """`_nhd_bwd_core` with precomputed bits (1, H, S, S) uint8."""
    _nhd_bwd_core(
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
        get_bits=lambda h: bits_ref[0, h], threshold=threshold,
    )


def nhd_grads(q, k, v, g, num_heads: int, block: int, valid_len: int,
              bits=None, threshold: int = 0):
    """(dq, dk, dv) for the natural-layout kernel via the backward kernel.
    Handles row padding to the kernel tile (grads cropped back)."""
    gdim, s_in, dm = q.shape
    s = _round_up(s_in, 128)
    if s != s_in:
        pad = ((0, 0), (0, s - s_in), (0, 0))
        q, k, v, g = (jnp.pad(t, pad) for t in (q, k, v, g))
        valid_len = min(valid_len, s_in)
    crop = (lambda t: t[:, :s_in, :]) if s != s_in else (lambda t: t)
    spec = pl.BlockSpec((1, s, dm), lambda i: (i, 0, 0))
    shapes = [jax.ShapeDtypeStruct((gdim, s, dm), q.dtype)] * 3
    if bits is None:
        out = pl.pallas_call(
            functools.partial(
                _nhd_bwd_kernel,
                num_heads=num_heads, valid_len=valid_len, block=block,
            ),
            out_shape=shapes,
            grid=(gdim,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            interpret=_interpret(),
        )(q, k, v, g)
    else:
        assert bits.shape[2] == s, (bits.shape, s)  # bits made at padded size
        bspec = pl.BlockSpec((1, num_heads, s, s), lambda i: (i, 0, 0, 0))
        out = pl.pallas_call(
            functools.partial(
                _nhd_bwd_kernel_drop,
                num_heads=num_heads, valid_len=valid_len, block=block,
                threshold=threshold,
            ),
            out_shape=shapes,
            grid=(gdim,),
            in_specs=[spec, spec, spec, bspec, spec],
            out_specs=[spec] * 3,
            interpret=_interpret(),
        )(q, k, v, bits, g)
    return tuple(crop(t) for t in out)


# ---------------------------------------------------------------------------
# Natural-layout kernel with RoPE fused in: q/k arrive straight from their
# projections (unroped, (G, S, H*hd)); the per-head halves rotation happens in
# VMEM, eliminating the XLA rope ops and their head-reshape relayouts.
# ---------------------------------------------------------------------------


def _attention_kernel_nhd_rope(
    q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref,
    *, num_heads: int, valid_len: int, block: int,
):
    _, s, dmodel = q_ref.shape
    hd = dmodel // num_heads
    half = hd // 2
    scale = jnp.asarray(1.0 / math.sqrt(hd), q_ref.dtype)
    cos = cos_ref[:]
    sin = sin_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = cols < valid_len
    if block > 0:
        mask = mask & (rows // block == cols // block)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)

        def rope(t):
            x1 = t[:, :half].astype(jnp.float32)
            x2 = t[:, half:].astype(jnp.float32)
            return jnp.concatenate(
                [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
            ).astype(t.dtype)

        qh = rope(q[:, sl]) * scale
        kh = rope(k[:, sl])
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jax.lax.dot_general(
            weights, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _rope_attention_reference(q, k, v, cos, sin, num_heads: int, block: int):
    """jnp mirror of the rope-fused kernel (backward + tests).
    q/k/v: (G, S, H*hd) unroped; cos/sin: (>=S, hd/2)."""
    g, s, dm = q.shape
    hd = dm // num_heads
    half = hd // 2
    cs, sn = cos[:s], sin[:s]

    def rope(t):
        tr = t.reshape(g, s, num_heads, hd)
        x1 = tr[..., :half].astype(jnp.float32)
        x2 = tr[..., half:].astype(jnp.float32)
        return jnp.concatenate(
            [x1 * cs[:, None, :] - x2 * sn[:, None, :],
             x1 * sn[:, None, :] + x2 * cs[:, None, :]], axis=-1,
        ).astype(t.dtype)

    qh = rope(q) / math.sqrt(hd)
    kh = rope(k)
    vh = v.reshape(g, s, num_heads, hd)
    logits = jnp.einsum("gshd,gShd->ghsS", qh, kh).astype(jnp.float32)
    if block > 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where(rows // block == cols // block, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("ghsS,gShd->gshd", weights, vh)
    return out.reshape(g, s, dm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_rope_attention(q, k, v, cos, sin, num_heads: int, block: int = 0):
    """RoPE + masked attention, natural layout, one kernel per group."""
    g, s, dm = q.shape
    s_pad = _round_up(s, 128)
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    # cos/sin must cover the padded rows (extra rows are masked/cropped).
    tpad = ((0, max(0, s_pad - cos.shape[0])), (0, 0))
    cos = jnp.pad(cos[:s_pad].astype(jnp.float32), tpad)
    sin = jnp.pad(sin[:s_pad].astype(jnp.float32), tpad)

    spec = pl.BlockSpec((1, s_pad, dm), lambda i: (i, 0, 0))
    tspec = pl.BlockSpec(cos.shape, lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel_nhd_rope,
            num_heads=num_heads, valid_len=s, block=block,
        ),
        out_shape=jax.ShapeDtypeStruct((g, s_pad, dm), q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec, tspec, tspec],
        out_specs=spec,
        interpret=_interpret(),
    )(q, k, v, cos, sin)
    return out[:, :s, :]


def _rope_fwd(q, k, v, cos, sin, num_heads, block):
    return fused_rope_attention(q, k, v, cos, sin, num_heads, block), (q, k, v, cos, sin)


def _rope_bwd(num_heads, block, residuals, g):
    q, k, v, cos, sin = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _rope_attention_reference(q, k, v, cos, sin, num_heads, block),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


fused_rope_attention.defvjp(_rope_fwd, _rope_bwd)


# ---------------------------------------------------------------------------
# Whole-attention-block megakernel: projections + RoPE + (windowing) +
# masked attention + (overlap-average) + out-projection, one kernel per
# sample.  Everything between the pre-LN and the residual add runs in VMEM —
# no HBM intermediate for q/k/v, logits, windows, or rope casts.
# ---------------------------------------------------------------------------


def _attn_block_kernel(
    x_ref, wq_ref, wkv_ref, wk_ref, wv_ref, wo_ref, cos_ref, sin_ref, o_ref,
    *, num_heads: int, valid_len: int, window: int,
):
    """x_ref: (1, P, D) pre-normed input; o_ref: (1, P, D) attention output.

    ``window`` == 0: global attention over P rows with cols < valid_len.
    ``window`` > 0: rows are re-windowed in VMEM (stride = window/2), per-
    window attention via the block-diagonal mask, overlap-averaged back to
    padded coordinates — the reference's local attention semantics
    (model.py:409-471) including out-proj linearity (proj after average ==
    average of projs: no bias).
    """
    x = x_ref[0]
    p_len, d = x.shape
    stride = window // 2 if window else 0

    if window > 0:
        nb = p_len // stride
        blocks = x.reshape(nb, stride, d)
        windows = jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)
        n_rows = (nb - 1) * window
        xa = windows.reshape(n_rows, d)
        n_pad = _round_up(n_rows, 128)
        if n_pad != n_rows:
            xa = jnp.pad(xa, ((0, n_pad - n_rows), (0, 0)))
        kv_valid = n_rows
    else:
        xa = x
        n_pad = p_len
        kv_valid = valid_len

    def proj(a, w_ref):
        return jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(a.dtype)

    q = proj(xa, wq_ref)
    ckv = proj(xa, wkv_ref)
    k = proj(ckv, wk_ref)
    v = proj(ckv, wv_ref)

    hd = q.shape[-1] // num_heads
    half = hd // 2
    cos = cos_ref[:]  # (n_pad, hd/2) f32
    sin = sin_ref[:]

    def rope(t):
        # Per-head 2D slices: Mosaic does not support lane-splitting reshapes.
        outs = []
        for h in range(num_heads):
            th = t[:, h * hd : (h + 1) * hd]
            x1 = th[:, :half].astype(jnp.float32)
            x2 = th[:, half:].astype(jnp.float32)
            outs.append(
                jnp.concatenate(
                    [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
                ).astype(t.dtype)
            )
        return jnp.concatenate(outs, axis=-1)

    q = rope(q)
    k = rope(k)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    mask = cols < kv_valid
    if window > 0:
        mask = mask & (rows // window == cols // window)

    scale = jnp.asarray(1.0 / math.sqrt(hd), q.dtype)
    heads_out = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        heads_out.append(
            jax.lax.dot_general(
                weights, v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        )
    attn = jnp.concatenate(heads_out, axis=-1)  # (n_pad, H*hd)

    if window > 0:
        nb = p_len // stride
        ow = attn[:n_rows].reshape(nb - 1, window, attn.shape[-1])
        first = ow[:, :stride, :]
        second = ow[:, stride:, :]
        zeros = jnp.zeros((1, stride, attn.shape[-1]), attn.dtype)
        block_sum = jnp.concatenate([first, zeros], axis=0) + jnp.concatenate(
            [zeros, second], axis=0
        )  # (nb, stride, H*hd)
        idx = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
        count = jnp.where((idx > 0) & (idx < nb - 1), 2.0, 1.0).astype(jnp.float32)
        avg = (block_sum.astype(jnp.float32) / count).astype(attn.dtype)
        attn = avg.reshape(p_len, attn.shape[-1])

    o_ref[0] = jax.lax.dot_general(
        attn, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention_layer(
    x: jax.Array,
    wq: jax.Array,
    wkv: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    num_heads: int,
    valid_len: int,
    window: int = 0,
) -> jax.Array:
    """x: (B, P, D) pre-normed (P padded as the caller's geometry requires);
    returns the (B, P, D) attention-block output."""
    b, p_len, d = x.shape
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_len, d), lambda i: (i, 0, 0)),
            pl.BlockSpec(wq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(wk.shape, lambda i: (0, 0)),
            pl.BlockSpec(wv.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(cos.shape, lambda i: (0, 0)),
            pl.BlockSpec(sin.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, p_len, d), lambda i: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _attn_block_kernel,
            num_heads=num_heads,
            valid_len=valid_len,
            window=window,
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_len, d), x.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(x, wq, wkv, wk, wv, wo, cos, sin)


def _attention_layer_reference(
    x, wq, wkv, wk, wv, wo, cos, sin, num_heads: int, valid_len: int, window: int
):
    """jnp mirror of the megakernel math (backward pass + golden tests)."""
    b, p_len, d = x.shape
    stride = window // 2 if window else 0

    if window > 0:
        nb = p_len // stride
        blocks = x.reshape(b, nb, stride, d)
        xa = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=2).reshape(
            b, (nb - 1) * window, d
        )
        n = xa.shape[1]
        kv_valid = n
    else:
        xa = x
        n = p_len
        kv_valid = valid_len

    def proj(a, w):
        return jax.lax.dot_general(
            a, w, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(a.dtype)

    q, ckv = proj(xa, wq), proj(xa, wkv)
    k, v = proj(ckv, wk), proj(ckv, wv)

    hd = q.shape[-1] // num_heads
    half = hd // 2
    cs, sn = cos[:n], sin[:n]

    def rope(t):
        tr = t.reshape(b, n, num_heads, hd)
        x1 = tr[..., :half].astype(jnp.float32)
        x2 = tr[..., half:].astype(jnp.float32)
        rot = jnp.concatenate(
            [x1 * cs[:, None, :] - x2 * sn[:, None, :],
             x1 * sn[:, None, :] + x2 * cs[:, None, :]], axis=-1,
        )
        return rot.astype(t.dtype).reshape(b, n, num_heads * hd)

    q, k = rope(q), rope(k)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = cols < kv_valid
    if window > 0:
        mask = mask & (rows // window == cols // window)

    qh = q.reshape(b, n, num_heads, hd) / math.sqrt(hd)
    kh = k.reshape(b, n, num_heads, hd)
    vh = v.reshape(b, n, num_heads, hd)
    logits = jnp.einsum("bshd,bShd->bhsS", qh, kh).astype(jnp.float32)
    logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    attn = jnp.einsum("bhsS,bShd->bshd", weights, vh).reshape(b, n, num_heads * hd)

    if window > 0:
        nb = p_len // stride
        ow = attn.reshape(b, nb - 1, window, attn.shape[-1])
        first, second = ow[:, :, :stride, :], ow[:, :, stride:, :]
        zeros = jnp.zeros((b, 1, stride, attn.shape[-1]), attn.dtype)
        block_sum = jnp.concatenate([first, zeros], 1) + jnp.concatenate(
            [zeros, second], 1
        )
        count = jnp.ones((nb,), jnp.float32).at[1:-1].set(2.0)
        attn = (
            (block_sum.astype(jnp.float32) / count[None, :, None, None])
            .astype(attn.dtype)
            .reshape(b, p_len, attn.shape[-1])
        )

    return proj(attn, wo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attention_layer_diff(
    x, wq, wkv, wk, wv, wo, cos, sin, num_heads: int, valid_len: int, window: int
):
    return fused_attention_layer(
        x, wq, wkv, wk, wv, wo, cos, sin, num_heads, valid_len, window
    )


def _layer_fwd(x, wq, wkv, wk, wv, wo, cos, sin, num_heads, valid_len, window):
    out = fused_attention_layer(
        x, wq, wkv, wk, wv, wo, cos, sin, num_heads, valid_len, window
    )
    return out, (x, wq, wkv, wk, wv, wo, cos, sin)


def _layer_bwd(num_heads, valid_len, window, residuals, g):
    x, wq, wkv, wk, wv, wo, cos, sin = residuals
    _, vjp = jax.vjp(
        lambda *args: _attention_layer_reference(
            *args, num_heads=num_heads, valid_len=valid_len, window=window
        ),
        x, wq, wkv, wk, wv, wo, cos, sin,
    )
    return vjp(g)


fused_attention_layer_diff.defvjp(_layer_fwd, _layer_bwd)


# ---------------------------------------------------------------------------
# In-kernel PRNG dropout: the dropout mask is generated INSIDE the kernels by
# the TPU hardware PRNG (pltpu.prng_seed / prng_random_bits) instead of being
# precomputed and streamed from HBM.  At batch 64 the precomputed uint8 bits
# cost generation + an HBM stream through both the forward kernel and its
# remat replay (~25 ms/step of the default-config training step, PERF.md
# round 3); in-kernel generation removes both.  Each (sample, phase, head)
# core reseeds deterministically from (s0, s1) x (global_sample, core_id) —
# global_sample is the ABSOLUTE sample index, so forward, backward, and the
# bits-dump kernel reproduce identical masks regardless of their grid cell
# sizes (see `_prng_bits` for the 2-word seed fold).  The mask semantics are
# bit-identical to the precomputed path: keep iff (bits & 0xFF) >= threshold,
# inverted scaling by 256/(256-thr).
#
# Interpret mode (the CPU test suite) has no lowering for the prng
# primitives in this JAX version ("MLIR translation rule for primitive
# 'prng_seed' not found"), so the path is gated to real TPU
# (`prng_dropout_available`) and validated ON-CHIP against the bits-dump
# kernel + XLA mirror by tools/tpu_selftest.py (determinism, dumped-bits
# mirror parity for fwd+grads, keep-rate statistics).
# ---------------------------------------------------------------------------

from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def prng_dropout_available() -> bool:
    return not _interpret() and _os.environ.get("A2M_PRNG_DROPOUT", "1") != "0"


def seed_from_key(key) -> jax.Array:
    """(2,) int32 seed material derived from a threefry key."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(key, (2,), jnp.uint32), jnp.int32
    )


def _fmix32(h):
    """murmur3 finalizer (wrap-around int32 multiply, logical shifts)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)  # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)  # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _prng_bits(seed_ref, global_s, core: int, shape):
    """Reseed for one attention core and draw its low-byte bits (int32 in
    [0, 255]; `_apply_bits`'s int32 compare consumes them directly).

    Mosaic on this libtpu accepts at most TWO words in
    ``tpu.prng_set_seed_32`` ("Setting seed with more than 2 values is not
    supported"), so (global_s, core) are folded into the two seed words via
    a murmur3-finalizer chain instead of being passed as extra values; the
    chain decorrelates the per-core streams even though adjacent core ids
    differ by 1."""
    cid = _fmix32(global_s * 256 + core)
    pltpu.prng_seed(seed_ref[0] ^ cid, seed_ref[1] ^ _fmix32(cid))
    return jnp.bitwise_and(pltpu.prng_random_bits(shape), 255)


def _two_phase_kernel_drop_prng(
    seed_ref, qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref,
    *, num_heads: int, window: int, threshold: int,
):
    """`_two_phase_core` with the dropout bits generated in-kernel by the
    TPU hardware PRNG.  Stream id is (ABSOLUTE sample, ph*H + h) — the same
    mapping as the backward kernel and `dump_bits_two_phase`, so identical
    masks reproduce regardless of grid cell sizes."""
    n, p_len, _ = qa_ref.shape
    base = pl.program_id(0) * n
    _two_phase_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, o_ref,
        num_heads=num_heads, window=window,
        get_bits=lambda s, ph, h: _prng_bits(
            seed_ref, base + s, ph * num_heads + h, (p_len, p_len)
        ),
        threshold=threshold,
    )


def _two_phase_drop_prng_impl(qa, ka, qb, kb, v, seed, num_heads, window, threshold):
    b, p_len, dm = qa.shape
    n = _two_phase_cell(b, p_len, dm)
    spec = pl.BlockSpec((n, p_len, dm), lambda i, seed: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _two_phase_kernel_drop_prng,
            num_heads=num_heads, window=window, threshold=threshold,
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // n,),
            in_specs=[spec] * 5,
            out_specs=spec,
        ),
        interpret=_interpret(),
    )(seed, qa, ka, qb, kb, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_local_two_phase_dropout_prng(
    qa, ka, qb, kb, v, seed, num_heads: int, window: int, threshold: int
):
    """Two-phase local attention + overlap averaging with attention-weight
    dropout whose mask is generated in-kernel by the TPU PRNG.  ``seed``:
    (2,) int32 (see `seed_from_key`)."""
    return _two_phase_drop_prng_impl(
        qa, ka, qb, kb, v, seed, num_heads, window, threshold
    )


def _two_phase_drop_prng_fwd(qa, ka, qb, kb, v, seed, num_heads, window, threshold):
    out = _two_phase_drop_prng_impl(
        qa, ka, qb, kb, v, seed, num_heads, window, threshold
    )
    return out, (qa, ka, qb, kb, v, seed)


def _two_phase_bwd_kernel_drop_prng(
    seed_ref, qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
    dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
    *, num_heads: int, window: int, threshold: int,
):
    """`_two_phase_bwd_core` with hardware-PRNG bits — stream ids
    (ABSOLUTE sample, ph*H + h), matching the forward kernel exactly even
    when the backward grid uses a different cell size."""
    n, p_len, _ = qa_ref.shape
    base = pl.program_id(0) * n
    _two_phase_bwd_core(
        qa_ref, ka_ref, qb_ref, kb_ref, v_ref, g_ref,
        dqa_ref, dka_ref, dqb_ref, dkb_ref, dv_ref,
        num_heads=num_heads, window=window,
        get_bits=lambda s, ph, h: _prng_bits(
            seed_ref, base + s, ph * num_heads + h, (p_len, p_len)
        ),
        threshold=threshold,
    )


def two_phase_grads_drop_prng(
    qa, ka, qb, kb, v, seed, g, num_heads: int, window: int, threshold: int
):
    b, p_len, dm = qa.shape
    n = _two_phase_bwd_cell(b, p_len, dm)
    spec = pl.BlockSpec((n, p_len, dm), lambda i, seed: (i, 0, 0))
    shapes = [jax.ShapeDtypeStruct((b, p_len, dm), qa.dtype)] * 5
    return pl.pallas_call(
        functools.partial(
            _two_phase_bwd_kernel_drop_prng,
            num_heads=num_heads, window=window, threshold=threshold,
        ),
        out_shape=shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // n,),
            in_specs=[spec] * 6,
            out_specs=[spec] * 5,
        ),
        interpret=_interpret(),
    )(seed, qa, ka, qb, kb, v, g)


def _zero_seed_cotangent(seed):
    import numpy as np

    return np.zeros(seed.shape, jax.dtypes.float0)


def _two_phase_drop_prng_bwd(num_heads, window, threshold, residuals, g):
    qa, ka, qb, kb, v, seed = residuals
    if _use_bwd_kernel():
        grads = two_phase_grads_drop_prng(
            qa, ka, qb, kb, v, seed, g, num_heads, window, threshold
        )
        return (*grads, _zero_seed_cotangent(seed))
    bits = dump_bits_two_phase(seed, qa.shape[0], num_heads, qa.shape[1])
    _, vjp = jax.vjp(
        lambda *a: _two_phase_reference_bits(
            *a, bits[0], bits[1], num_heads=num_heads, window=window,
            threshold=threshold,
        ),
        qa, ka, qb, kb, v,
    )
    grads = vjp(g)
    return (*grads, _zero_seed_cotangent(seed))


fused_local_two_phase_dropout_prng.defvjp(
    _two_phase_drop_prng_fwd, _two_phase_drop_prng_bwd
)


def _bits_dump_kernel(seed_ref, o_ref, *, cores: int):
    """Dump the per-core PRNG bits (test oracle + XLA-fallback backward).
    o_ref: (1, cores, P, P) int32."""
    _, _, p_len, _ = o_ref.shape
    base = pl.program_id(0)
    for core in range(cores):
        o_ref[0, core] = _prng_bits(seed_ref, base, core, (p_len, p_len))


def _dump_bits(seed, b: int, cores: int, p_len: int):
    spec = pl.BlockSpec((1, cores, p_len, p_len), lambda i, seed: (i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_bits_dump_kernel, cores=cores),
        out_shape=jax.ShapeDtypeStruct((b, cores, p_len, p_len), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,), in_specs=[], out_specs=spec,
        ),
        interpret=_interpret(),
    )(seed)
    return out.astype(jnp.uint8)


def dump_bits_two_phase(seed, b: int, num_heads: int, p_len: int):
    """(2, B, H, P, P) uint8 — the masks the two-phase PRNG kernels use."""
    bits = _dump_bits(seed, b, 2 * num_heads, p_len)
    return bits[:, :num_heads], bits[:, num_heads:]


def dump_bits_nhd(seed, g: int, num_heads: int, s: int):
    """(G, H, S, S) uint8 — the masks the nhd PRNG kernels use."""
    return _dump_bits(seed, g, num_heads, s)


def _attention_kernel_nhd_drop_prng(
    seed_ref, q_ref, k_ref, v_ref, o_ref,
    *, num_heads: int, valid_len: int, block: int, threshold: int,
):
    """`_nhd_core` with the dropout bits generated in-kernel by the TPU
    hardware PRNG (same (sample, head) streams as `dump_bits_nhd`)."""
    _, s, _ = q_ref.shape
    _nhd_core(
        q_ref, k_ref, v_ref, o_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
        get_bits=lambda h: _prng_bits(seed_ref, pl.program_id(0), h, (s, s)),
        threshold=threshold,
    )


def _nhd_drop_prng_impl(q, k, v, seed, num_heads, block, threshold, valid_len):
    g, s, dm = q.shape
    spec = pl.BlockSpec((1, s, dm), lambda i, seed: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _attention_kernel_nhd_drop_prng,
            num_heads=num_heads, valid_len=valid_len, block=block,
            threshold=threshold,
        ),
        out_shape=jax.ShapeDtypeStruct((g, s, dm), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[spec] * 3,
            out_specs=spec,
        ),
        interpret=_interpret(),
    )(seed, q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attention_nhd_dropout_prng(
    q, k, v, seed, num_heads: int, block: int, threshold: int, valid_len: int
):
    """Natural-layout fused attention with in-kernel-PRNG dropout."""
    return _nhd_drop_prng_impl(q, k, v, seed, num_heads, block, threshold, valid_len)


def _nhd_drop_prng_fwd(q, k, v, seed, num_heads, block, threshold, valid_len):
    out = _nhd_drop_prng_impl(
        q, k, v, seed, num_heads, block, threshold, valid_len
    )
    return out, (q, k, v, seed)


def _nhd_bwd_kernel_drop_prng(
    seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, valid_len: int, block: int, threshold: int,
):
    """`_nhd_bwd_core` with hardware-PRNG bits — same (sample, head)
    streams as the forward kernel and `dump_bits_nhd`."""
    _, s, _ = q_ref.shape
    _nhd_bwd_core(
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
        num_heads=num_heads, valid_len=valid_len, block=block,
        get_bits=lambda h: _prng_bits(seed_ref, pl.program_id(0), h, (s, s)),
        threshold=threshold,
    )


def nhd_grads_prng(q, k, v, seed, g, num_heads: int, block: int,
                   valid_len: int, threshold: int):
    gdim, s, dm = q.shape
    spec = pl.BlockSpec((1, s, dm), lambda i, seed: (i, 0, 0))
    shapes = [jax.ShapeDtypeStruct((gdim, s, dm), q.dtype)] * 3
    return pl.pallas_call(
        functools.partial(
            _nhd_bwd_kernel_drop_prng,
            num_heads=num_heads, valid_len=valid_len, block=block,
            threshold=threshold,
        ),
        out_shape=shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gdim,),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
        ),
        interpret=_interpret(),
    )(seed, q, k, v, g)


def _nhd_drop_prng_bwd(num_heads, block, threshold, valid_len, residuals, g):
    q, k, v, seed = residuals
    if _use_bwd_kernel():
        dq, dk, dv = nhd_grads_prng(
            q, k, v, seed, g, num_heads, block,
            valid_len=valid_len, threshold=threshold,
        )
        return dq, dk, dv, _zero_seed_cotangent(seed)
    bits = dump_bits_nhd(seed, q.shape[0], num_heads, q.shape[1])
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_nhd_bits(
            q, k, v, bits, num_heads, block, threshold, valid_len=valid_len
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, _zero_seed_cotangent(seed)


fused_attention_nhd_dropout_prng.defvjp(_nhd_drop_prng_fwd, _nhd_drop_prng_bwd)
