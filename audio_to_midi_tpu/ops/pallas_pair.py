"""Transformer-pair megakernel: one Pallas kernel runs a FULL alternating
local+global transformer pair (reference model.py:559-612) — four pre-LN
sublayers (local windowed attention, GLU FFN, global attention, GLU FFN) with
their residual adds — entirely in VMEM.

Why: the XLA path writes every intermediate (~40 ops/pair, each a ~16 MB
activation at batch 128) back to HBM; keeping a cell of samples resident in
VMEM for the whole pair reduces HBM traffic per pair to x-in + x-out + the
~2.3 MB of pair weights, and lets the sublayers share layout.

Design notes (all measured on v5e via device-profiler timing):
  * grid cell = ``n_per_cell`` samples; LN / projections / FFN matmuls are
    batched over all (n_per_cell * rows) rows so the MXU sees big matmuls;
    only the attention cores loop per sample.
  * **Two-phase local attention**: the reference's stride-8/window-16 sliding
    windows (model.py:377-471) partition into two NON-overlapping sets —
    phase A: windows starting at 0,16,32,… (a plain block-diagonal-16 mask on
    the padded rows), phase B: windows starting at 8,24,… (the same mask
    shifted by 8, valid on rows [8, P-8)).  Every row is covered by exactly
    one window per phase, so the reference's overlap-average is exactly
    ``(outA + outB) / count`` with count = 2 on [8, P-8) and 1 at the edges.
    This removes the windowed gather/scatter entirely, halves the projection
    rows, and halves the masked-logits FLOPs vs. the flattened-windows
    formulation.  RoPE positions restart per window: phase A rows use
    position ``r mod 16``, phase B ``(r-8) mod 16`` — per-phase tables.
  * The sequence rides the scan in LOCAL-PADDED coordinates (pad_l, pad_r
    from the reference padding rule, model.py:421-428); rows outside
    [pad_l, pad_l+valid) are kept exactly zero after every sublayer,
    reproducing the reference's padded-coordinate scatter quirk
    (model.py:453-463) including the pad_l shift of the local branch.

The backward pass delegates to the XLA formulation (models/transformer.py
``alternating_layer``) via ``jax.custom_vjp`` in the caller, so training
through this kernel is exact w.r.t. the same math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_attention import _interpret, _round_up


def _ln_rows(xf: jax.Array, ln_ref, eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm over the lane axis; ln_ref rows = (scale, bias)."""
    x32 = xf.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_ref[0, :] + ln_ref[1, :]
    return y.astype(xf.dtype)


def _matmul(a: jax.Array, w_ref, b_ref=None) -> jax.Array:
    out = jax.lax.dot_general(
        a, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if b_ref is not None:
        out = out + b_ref[0, :].astype(jnp.float32)
    return out.astype(a.dtype)


def _rope_rows(t: jax.Array, cos: jax.Array, sin: jax.Array, num_heads: int):
    """Halves-layout RoPE per head on (rows, H*hd); cos/sin: (rows, hd//2) f32."""
    hd = t.shape[-1] // num_heads
    half = hd // 2
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


def _mha(q, k, v, mask, num_heads: int):
    """Per-head masked attention on (rows, H*hd) -> (rows, H*hd); fp32 softmax."""
    hd = q.shape[-1] // num_heads
    scale = jnp.asarray(1.0 / math.sqrt(hd), q.dtype)
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        outs.append(
            jax.lax.dot_general(
                weights, v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _pair_kernel(
    x_ref,
    # local attention + ffn
    l_ln1, l_wq, l_wkv, l_wk, l_wv, l_wo, l_ln2, l_w1, l_b1, l_w2, l_b2,
    # global attention + ffn
    g_ln1, g_wq, g_wkv, g_wk, g_wv, g_wo, g_ln2, g_w1, g_b1, g_w2, g_b2,
    cos_a, sin_a, cos_b, sin_b, cos_g, sin_g,
    o_ref,
    *, num_heads: int, valid_len: int, pad_l: int, window: int,
):
    """x_ref/o_ref: (n, P, D) in local-padded coordinates — rows
    [pad_l, pad_l+valid_len) hold the sequence, all other rows are zero (an
    invariant this kernel maintains on its output)."""
    n, p_len, d = x_ref.shape
    stride = window // 2

    x = x_ref[...]                      # (n, P, D)
    rows = n * p_len

    # Row-validity mask over the flattened (n*P) rows.
    r_in_seq = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % p_len
    row_valid = (r_in_seq >= pad_l) & (r_in_seq < pad_l + valid_len)

    def masked(t):
        return jnp.where(row_valid, t, jnp.zeros_like(t))

    xf = x.reshape(rows, d)

    # ---- sublayer 1: local windowed attention (two-phase) ----------------
    normed = masked(_ln_rows(xf, l_ln1))
    q = _matmul(normed, l_wq)
    ckv = _matmul(normed, l_wkv)
    k = _matmul(ckv, l_wk)
    v = _matmul(ckv, l_wv)

    # Per-sample block-diagonal masks for the two phases.  Phase B rows
    # outside [stride, P-stride) belong to no window; their output is
    # excluded from the average.
    pr = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    mask_a = pr // window == pc // window
    b_band = (pc >= stride) & (pc < p_len - stride)
    mask_b = ((pr - stride) // window == (pc - stride) // window) & b_band

    col = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
    b_rows = (col >= stride) & (col < p_len - stride)  # rows phase B covers
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
        # Reference quirk (model.py:453-463): the averaged buffer is indexed
        # by PADDED coordinates; crop its first valid_len rows and re-store
        # them at offset pad_l.
        shifted = jnp.pad(
            avg[:valid_len], ((pad_l, p_len - pad_l - valid_len), (0, 0))
        )
        per_sample.append(shifted)
    r = jnp.concatenate(per_sample, axis=0)  # (n*P, H*hd)
    xf = xf + masked(_matmul(r, l_wo))

    # ---- sublayer 2: local FFN (GLU) ------------------------------------
    h = _ln_rows(xf, l_ln2)
    h1 = _matmul(h, l_w1, l_b1)
    inter = h1.shape[-1] // 2
    g = jax.nn.gelu(h1[:, :inter]) * h1[:, inter:]
    xf = xf + masked(_matmul(g, l_w2, l_b2))

    # ---- sublayer 3: global attention -----------------------------------
    normed = masked(_ln_rows(xf, g_ln1))
    q = _matmul(normed, g_wq)
    ckv = _matmul(normed, g_wkv)
    k = _matmul(ckv, g_wk)
    v = _matmul(ckv, g_wv)
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
    xf = xf + masked(_matmul(r, g_wo))

    # ---- sublayer 4: global FFN ------------------------------------------
    h = _ln_rows(xf, g_ln2)
    h1 = _matmul(h, g_w1, g_b1)
    g_inter = h1.shape[-1] // 2  # split at the GLOBAL h1 width, not the local
    g2 = jax.nn.gelu(h1[:, :g_inter]) * h1[:, g_inter:]
    xf = xf + masked(_matmul(g2, g_w2, g_b2))

    o_ref[...] = xf.reshape(n, p_len, d)


def _pick_cell(batch: int, p_len: int, d: int) -> int:
    """Samples per grid cell: biggest of 8/4/2/1 that divides the batch and
    keeps the cell's activation footprint inside scoped VMEM (fp32 LN/FFN
    temporaries dominate)."""
    for n in (8, 4, 2, 1):
        if batch % n:
            continue
        approx = n * p_len * d * 2 * 22
        if approx <= 13 * 1024 * 1024:
            return n
    return 1


def fused_transformer_pair(
    xp: jax.Array,
    weights: list[jax.Array],
    tables: tuple[jax.Array, ...],
    *,
    num_heads: int,
    valid_len: int,
    pad_l: int,
    window: int,
) -> jax.Array:
    """xp: (B, P, D) in local-padded coordinates (valid rows at offset pad_l,
    other rows zero).  ``weights``: the 22 pair arrays in kernel order.
    ``tables``: (cos_a, sin_a, cos_b, sin_b, cos_g, sin_g), each (P, hd//2) —
    phase-A/-B window-restarting rope tables and the absolute-position table
    offset by pad_l."""
    b, p_len, d = xp.shape
    n = _pick_cell(b, p_len, d)
    xspec = pl.BlockSpec((n, p_len, d), lambda i: (i, 0, 0))
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim) for w in weights]
    tspecs = [pl.BlockSpec(t.shape, lambda i: (0, 0)) for t in tables]
    return pl.pallas_call(
        functools.partial(
            _pair_kernel,
            num_heads=num_heads, valid_len=valid_len, pad_l=pad_l, window=window,
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_len, d), xp.dtype),
        grid=(b // n,),
        in_specs=[xspec] + wspecs + tspecs,
        out_specs=xspec,
        interpret=_interpret(),
    )(xp, *weights, *tables)


def pair_weights(p: dict, dtype) -> list[jax.Array]:
    """Flatten one alternating-pair param dict (models/transformer.py
    ``init_alternating_layer`` structure) into kernel argument order."""
    out = []
    for side in ("local", "global"):
        lp = p[side]
        att = lp["attention"]
        out += [
            jnp.stack([lp["attention_norm"]["scale"], lp["attention_norm"]["bias"]]).astype(jnp.float32),
            att["q_up"]["w"].astype(dtype),
            att["kv_down"]["w"].astype(dtype),
            att["k_up"]["w"].astype(dtype),
            att["v_up"]["w"].astype(dtype),
            att["out"]["w"].astype(dtype),
            jnp.stack([lp["ff_norm"]["scale"], lp["ff_norm"]["bias"]]).astype(jnp.float32),
            lp["ff"]["in_proj"]["w"].astype(dtype),
            lp["ff"]["in_proj"]["b"].reshape(1, -1).astype(dtype),
            lp["ff"]["out_proj"]["w"].astype(dtype),
            lp["ff"]["out_proj"]["b"].reshape(1, -1).astype(dtype),
        ]
    return out


def pair_supported(p_len: int, d: int, num_heads: int, window: int) -> bool:
    """Geometry gate: the kernel's VMEM shapes need tile alignment and the
    two-phase decomposition needs window == 2*stride dividing P.  Unsupported
    geometries — including sequences so long that even a single-sample cell's
    estimated footprint blows the VMEM budget (`_pick_cell`'s n=1 estimate) —
    fall back to the XLA/pallas attention paths instead of failing at Mosaic
    compile time."""
    hd = d // num_heads if num_heads else 0
    return (
        window > 0
        and window % 2 == 0
        and p_len % 16 == 0
        and p_len % window == 0
        and d % 128 == 0
        and num_heads > 0
        and d % num_heads == 0
        and hd % 2 == 0
        and (hd // 2) % 8 == 0
        and p_len * d * 2 * 22 <= 13 * 1024 * 1024
    )
