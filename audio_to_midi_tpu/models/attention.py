"""Compressed-KV (MLA-style) self-attention and sliding-window local attention.

Reference semantics:
  * SelfAttention (model.py:260-374): q_up D->H*hd; shared kv_down D->ckv with
    key_up/value_up ckv->H*hd; RoPE on q and k after projection; out-proj; all
    projections bias-free; fp32 softmax; query scaled by 1/sqrt(hd); optional
    attention-weight dropout.
  * LocalSelfAttention (model.py:377-471): symmetric pad so stride-8 windows of
    16 cover everything; full attention per window (RoPE positions restart at 0
    inside every window); overlapping window outputs averaged.

    QUIRK preserved on purpose: the reference scatters window outputs using
    *padded* coordinates into an *unpadded* output buffer (model.py:453-463),
    so with pad_left=3 the averaged local-attention branch is shifted by 3
    frames relative to the residual stream, and out-of-range window outputs are
    dropped.  Training and inference share the shift, so the network learns
    around it; we must reproduce it exactly for checkpoint parity.  Instead of
    a scatter-add we use the window==2*stride structure: each stride-sized
    block of the padded sequence receives the first half of window k and the
    second half of window k-1 — a pad-and-add over reshapes, no scatter, which
    is the TPU-friendly formulation of the same arithmetic.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.pallas_attention import (
    attend_nhd_dropout,
    dropout_threshold,
    fused_attention_layer_diff,
    fused_attention_nhd_diff,
    fused_local_two_phase,
    fused_local_two_phase_dropout,
    fused_local_two_phase_rw,
    fused_rope_attention,
    mosaic_dtype_ok,
)
from . import nn
from .nn import Params
from .rope import RopeFreqs, apply_rope_halves, permute_qk_weight_for_rope


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_self_attention(key, cfg: ModelConfig, input_size: int | None = None) -> Params:
    d = input_size or cfg.transformer_hidden_dim
    h, hd = cfg.num_transformer_heads, cfg.attention_size
    ckv = cfg.compressed_attention_kv_size
    k_q, k_kvd, k_ku, k_vu, k_out = jax.random.split(key, 5)
    q_up = nn.init_linear(k_q, d, h * hd, use_bias=False)
    k_up = nn.init_linear(k_ku, ckv, h * hd, use_bias=False)
    # q/k weights are stored in RoPE "halves" layout (see rope.py) — the
    # attention output is exactly invariant; the converter applies the same
    # permutation when importing reference checkpoints.
    q_up["w"] = permute_qk_weight_for_rope(q_up["w"], h)
    k_up["w"] = permute_qk_weight_for_rope(k_up["w"], h)
    return {
        "q_up": q_up,
        "kv_down": nn.init_linear(k_kvd, d, ckv, use_bias=False),
        "k_up": k_up,
        "v_up": nn.init_linear(k_vu, ckv, h * hd, use_bias=False),
        "out": nn.init_linear(k_out, h * hd, d, use_bias=False),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _qkv(x: jax.Array, p: Params, num_heads: int, rope: RopeFreqs):
    """Project to rope'd q/k and v.  x: (..., S, D) -> (..., S, H, hd) each.

    Positions for RoPE run over the S axis and restart at 0 — for the local
    path x is (..., W, 16, D) so every window sees positions 0..15, exactly
    like the reference passing each window through SelfAttention.
    """
    *lead, s, _ = x.shape
    q = nn.linear(x, p["q_up"]).reshape(*lead, s, num_heads, -1)
    q = apply_rope_halves(q, rope)
    ckv = nn.linear(x, p["kv_down"])
    k = nn.linear(ckv, p["k_up"]).reshape(*lead, s, num_heads, -1)
    k = apply_rope_halves(k, rope)
    v = nn.linear(ckv, p["v_up"]).reshape(*lead, s, num_heads, -1)
    return q, k, v


def _tp_shard_ctx(num_heads: int):
    """(mesh, model_size) when head-sharded TP kernels are active, else None.

    Active iff the train loop (or a test) set the TP attention mesh
    (parallel/tp.set_tp_attention_mesh) AND the heads divide the model axis —
    the same condition under which tp_spec_tree shards the head projections,
    so activations arrive with contiguous whole-head blocks per shard.
    """
    from ..parallel import tp as tp_mod

    mesh = tp_mod.tp_attention_mesh()
    if mesh is None:
        return None
    from ..parallel.mesh import MODEL_AXIS

    msize = mesh.shape.get(MODEL_AXIS, 1)
    if msize <= 1 or num_heads % msize:
        return None
    return mesh, msize


def _shard_heads(call, num_heads: int, tensors, key: jax.Array | None = None):
    """Run an attention-core kernel per TP shard over its local heads.

    ``tensors``: 3-d (G, S, H*hd)-shaped arrays with contiguous head blocks in
    the last dim; ``call(local_heads, *local_tensors, key)`` must be head-
    local (true of every attention core — heads never interact).  Without an
    active TP context this is exactly ``call(num_heads, *tensors, key)``.

    Under TP the call runs inside ``jax.shard_map`` manual over the "model"
    axis (and "data" when the batch divides — otherwise the batch stays
    auto/GSPMD-managed, which replicates the opaque kernel over data: correct,
    and only hit by ragged eval batches).  The ensemble axis is always auto —
    the train step's ensemble vmap rides shard_map's batching rule.  The
    dropout ``key`` is decorrelated per shard via fold_in(axis_index) so no
    two (sample, head) streams coincide across shards.
    """
    ctx = _tp_shard_ctx(num_heads)
    if ctx is None:
        return call(num_heads, *tensors, key)
    mesh, msize = ctx
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    g = tensors[0].shape[0]
    data = mesh.shape.get(DATA_AXIS, 1)
    use_data = data > 1 and g % data == 0
    manual = {MODEL_AXIS} | ({DATA_AXIS} if use_data else set())
    spec = P(DATA_AXIS if use_data else None, None, MODEL_AXIS)

    def body(*ts):
        k = key
        if k is not None:
            k = jax.random.fold_in(k, jax.lax.axis_index(MODEL_AXIS))
            if use_data:
                k = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
        return call(num_heads // msize, *ts, k)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec,) * len(tensors),
        out_specs=spec,
        check_vma=False,
        axis_names=manual,
    )(*tensors)


def _attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dropout_rate: float,
    key: jax.Array | None,
    enable_dropout: bool,
    impl: str = "xla",
    block: int = 0,
    fast_rng: bool = False,
) -> jax.Array:
    """Multi-head attention core.  q,k,v: (..., S, H, hd) -> (..., S, H*hd).

    fp32 softmax, query pre-scaled by 1/sqrt(hd) (reference model.py:250-252).
    ``impl="pallas"`` runs the fused VMEM kernel (ops/pallas_attention.py) —
    with attention-weight dropout the mask rides into the kernel as
    precomputed uint8 bits (rate quantized to 1/256 steps), so the reference-
    parity training config (dropout 0.1, model.py:31) keeps the fast kernels.
    ``block`` > 0 applies the block-diagonal mask for the flattened
    local-window formulation.
    """
    # In-kernel dropout wants MXU-sized row tiles; the tiny-window fallback
    # shapes (S = window = 16) stay on XLA.
    drop_kernel_ok = (
        enable_dropout
        and key is not None
        and q.shape[-3] >= 128
        and 0 < dropout_threshold(dropout_rate) < 256
    )
    # A nonzero rate below 1/512 quantizes to threshold 0; the kernels would
    # silently run dropout-FREE where the XLA path applies the true rate, so
    # such rates stay on XLA (reference semantics over speed).  Rates >= 511/512
    # quantize to 256 (keep NOTHING) — _apply_bits's inverted scaling divides
    # by (256 - threshold), so those also stay on XLA (which zeroes cleanly).
    if impl in ("pallas", "pallas_rw") and mosaic_dtype_ok(q.dtype) and (
            not enable_dropout or drop_kernel_ok):
        # Natural-layout kernel: (.., S, H, hd) -> (G, S, H*hd) is a free
        # reshape (no transposes, so no XLA relayout copies around the call).
        *lead, s, h, hd = q.shape
        flat = lambda x: x.reshape(-1, s, h * hd)
        if drop_kernel_ok:
            def call(h_local, fq, fk, fv, k_):
                return attend_nhd_dropout(fq, fk, fv, k_, h_local, dropout_rate, block)

            out = _shard_heads(call, h, (flat(q), flat(k), flat(v)), key=key)
        else:
            def call(h_local, fq, fk, fv, _k):
                return fused_attention_nhd_diff(fq, fk, fv, h_local, block)

            out = _shard_heads(call, h, (flat(q), flat(k), flat(v)))
        return out.reshape(*lead, s, h * hd)

    hd = q.shape[-1]
    q = q / jnp.asarray(math.sqrt(hd), q.dtype)
    logits = jnp.einsum("...shd,...Shd->...hsS", q, k)
    if block > 0:
        s = q.shape[-3]
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where(rows // block == cols // block, logits, -1e30)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    weights = nn.dropout(weights, dropout_rate, key, enable_dropout, fast_rng=fast_rng)
    attn = jnp.einsum("...hsS,...Shd->...shd", weights, v)
    *lead, s, h, d = attn.shape
    return attn.reshape(*lead, s, h * d)


def _rope_with(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Halves-layout RoPE with explicit per-row tables.
    x: (B, S, H, hd); cos/sin: (S, hd//2)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.astype(x.dtype)


def _rope_tables(rope: RopeFreqs, n: int, window: int):
    """(n, hd/2) cos/sin tables: absolute positions (global) or positions
    restarting every ``window`` rows (flattened local windows)."""
    if window > 0:
        reps = -(-n // window)
        cos = jnp.tile(rope.cos[:window], (reps, 1))[:n]
        sin = jnp.tile(rope.sin[:window], (reps, 1))[:n]
        return cos, sin
    return rope.cos[:n], rope.sin[:n]


def _attention_block_pallas(
    x: jax.Array, p: Params, rope: RopeFreqs, cfg: ModelConfig,
    valid_len: int, window: int,
) -> jax.Array:
    """Whole attention block (proj+rope+attn+avg+out-proj) as one kernel.

    x: (B, P, D) pre-normed (P = the local padded length when window > 0).
    """
    from ..ops.pallas_attention import _round_up

    b, p_len, d = x.shape
    if window > 0:
        stride = window // 2
        n_rows = (p_len // stride - 1) * window
        n_pad = _round_up(n_rows, 128)
    else:
        n_pad = p_len
    cos, sin = _rope_tables(rope, n_pad, window)
    w = lambda name: p[name]["w"].astype(x.dtype)
    return fused_attention_layer_diff(
        x, w("q_up"), w("kv_down"), w("k_up"), w("v_up"), w("out"),
        cos, sin, cfg.num_transformer_heads, valid_len, window,
    )


def self_attention(
    x: jax.Array,
    p: Params,
    rope: RopeFreqs,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Global compressed-KV attention.  x: (..., S, D) -> same shape."""
    # Dropout only gates the kernel paths when it actually does something —
    # rate 0.0 (or inference) keeps the fast kernels even in training.
    enable_dropout = enable_dropout and cfg.transformer_dropout_rate > 0
    if (cfg.attention_impl == "pallas_block" and not enable_dropout
            and x.ndim == 3 and mosaic_dtype_ok(x.dtype)):
        # Whole-block megakernel (proj+rope+attn+out-proj in one kernel).
        # Measured slightly slower than "pallas" at B=128 on v5e (per-sample
        # projections lose to batched XLA matmuls) — kept as an option for
        # other batch regimes.
        return _attention_block_pallas(x, p, rope, cfg, valid_len=x.shape[1], window=0)
    # (Fusing RoPE into the kernel — fused_rope_attention — was measured
    # slower: per-cell serial VPU rotation loses to XLA's batched rope.)
    q, k, v = _qkv(x, p, cfg.num_transformer_heads, rope)
    attn = _attend(
        q, k, v,
        dropout_rate=cfg.transformer_dropout_rate,
        key=key,
        enable_dropout=enable_dropout,
        impl=cfg.attention_impl,
        fast_rng=cfg.fast_dropout_rng,
    )
    return nn.linear(attn, p["out"])


def _local_padding(seq_len: int, window: int) -> tuple[int, int]:
    """Reference model.py:421-428 padding rule."""
    stride = window // 2
    required = stride - (seq_len - window) % stride
    if required == stride:
        return 0, 0
    return required // 2, required - required // 2


def local_self_attention(
    x: jax.Array,
    p: Params,
    rope: RopeFreqs,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    enable_dropout: bool = False,
) -> jax.Array:
    """Sliding-window attention with overlap averaging (+ reference quirk).

    x: (B, S, D) -> (B, S, D).
    """
    enable_dropout = enable_dropout and cfg.transformer_dropout_rate > 0
    b, seq_len, d = x.shape
    window = cfg.local_context_window
    stride = window // 2
    assert window == 2 * stride, "overlap-average formulation needs window == 2*stride"

    pad_l, pad_r = _local_padding(seq_len, window)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    padded = xp.shape[1]
    num_windows = (padded - window) // stride + 1
    if num_windows < 1:
        # The reference's scatter/count formulation hits 0/0 = NaN here
        # (model.py:449-465); fail loudly rather than silently attending
        # over zero windows and degenerating to the residual identity.
        raise ValueError(
            f"local attention needs seq_len > window//2 (= {stride}); "
            f"got seq_len={seq_len} with local_context_window={window}"
        )
    num_blocks = padded // stride
    assert num_blocks == num_windows + 1

    if (cfg.attention_impl == "pallas_block" and not enable_dropout
            and mosaic_dtype_ok(x.dtype)):
        # One kernel does windowing + proj + rope + masked attention +
        # overlap-average + out-proj entirely in VMEM; crop reproduces the
        # reference's padded-coordinate quirk.
        out = _attention_block_pallas(
            xp, p, rope, cfg, valid_len=padded, window=window
        )
        return out[:, :seq_len, :]

    if (
        cfg.attention_impl in ("pallas", "pallas_rw")
        and mosaic_dtype_ok(x.dtype)
        and (
            not enable_dropout
            # Sub-1/512 rates quantize to threshold 0 — keep them on the XLA
            # path below, which applies the exact rate via nn.dropout; rates
            # quantizing to 256 (keep nothing) likewise stay on XLA.
            or (key is not None
                and 0 < dropout_threshold(cfg.transformer_dropout_rate) < 256)
        )
        and padded % window == 0
        and padded % 16 == 0
    ):
        # Two-phase formulation: q/k/v projected ONCE on the padded rows (the
        # projections commute with windowing), RoPE'd twice with per-phase
        # window-restarting tables, then one kernel computes both phase
        # attentions and the overlap average (see ops/pallas_attention.py).
        # With dropout the per-phase masks ride in as uint8 bits — each
        # original window lies in exactly one phase, so per-window weights
        # are independently dropped exactly like the reference's per-window
        # dropout (model.py:253-257, 437-447).
        heads, hd = cfg.num_transformer_heads, cfg.attention_size
        q = nn.linear(xp, p["q_up"]).reshape(b, padded, heads, hd)
        ckv = nn.linear(xp, p["kv_down"])
        k = nn.linear(ckv, p["k_up"]).reshape(b, padded, heads, hd)
        v = nn.linear(ckv, p["v_up"])
        reps = padded // window
        cos_a = jnp.tile(rope.cos[:window], (reps, 1))
        sin_a = jnp.tile(rope.sin[:window], (reps, 1))
        cos_b = jnp.roll(cos_a, stride, axis=0)
        sin_b = jnp.roll(sin_a, stride, axis=0)
        flat = lambda t: t.reshape(b, padded, heads * hd)
        qa, ka = _rope_with(q, cos_a, sin_a), _rope_with(k, cos_a, sin_a)
        qb, kb = _rope_with(q, cos_b, sin_b), _rope_with(k, cos_b, sin_b)
        threshold = dropout_threshold(cfg.transformer_dropout_rate)
        if enable_dropout and threshold > 0:
            from ..ops import pallas_attention as pa

            if pa.prng_dropout_available():
                # Mask generated in-kernel by the TPU hardware PRNG — no
                # bits to generate or stream through HBM (PERF.md round 3).
                def call(h_local, fqa, fka, fqb, fkb, v_, k_):
                    return pa.fused_local_two_phase_dropout_prng(
                        fqa, fka, fqb, fkb, v_,
                        pa.seed_from_key(k_), h_local, window, threshold,
                    )
            else:
                def call(h_local, fqa, fka, fqb, fkb, v_, k_):
                    bits = pa.random_bits_fast(
                        k_, (2, v_.shape[0], h_local, padded, padded)
                    )
                    return fused_local_two_phase_dropout(
                        fqa, fka, fqb, fkb, v_,
                        bits[0], bits[1], h_local, window, threshold,
                    )

            out = _shard_heads(
                call, heads, (flat(qa), flat(ka), flat(qb), flat(kb), v),
                key=key,
            )
        else:
            if cfg.attention_impl == "pallas_rw":
                def call(h_local, fqa, fka, fqb, fkb, v_, _k):
                    return fused_local_two_phase_rw(
                        fqa, fka, fqb, fkb, v_, h_local, window
                    )
            else:
                def call(h_local, fqa, fka, fqb, fkb, v_, _k):
                    return fused_local_two_phase(
                        fqa, fka, fqb, fkb, v_, h_local, window
                    )

            out = _shard_heads(
                call, heads, (flat(qa), flat(ka), flat(qb), flat(kb), v)
            )
        # Reference quirk: crop the padded-coordinate average to the first
        # seq_len rows; out-proj is bias-free so it commutes with the crop.
        return nn.linear(out[:, :seq_len, :], p["out"])

    # (B, num_windows, window, D): window w covers padded[w*stride : w*stride+window].
    # Built from two interleaved non-overlapping reshapes — no gather.
    blocks = xp.reshape(b, num_blocks, stride, d)
    windows = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=2)

    q, k, v = _qkv(windows, p, cfg.num_transformer_heads, rope)
    # mosaic_dtype_ok: a dtype the kernel can't take (f16) must use the
    # windowed (B,W,16,16) einsum below, not _attend's internal fallback —
    # that one softmaxes the FLATTENED (496, 496) masked sequence, ~31x the
    # logits work for the same result.
    if (
        cfg.attention_impl in ("pallas", "pallas_rw")
        and not enable_dropout
        and mosaic_dtype_ok(q.dtype)
    ):
        # Flatten the (windows, window) axes into one sequence and let the
        # fused kernel's block-diagonal mask realize the per-window softmax.
        heads, hd = q.shape[-2], q.shape[-1]
        flat = lambda t: t.reshape(b, num_windows * window, heads, hd)
        out_w = _attend(
            flat(q), flat(k), flat(v),
            dropout_rate=0.0, key=None, enable_dropout=False,
            impl="pallas", block=window,
        ).reshape(b, num_windows, window, heads * hd)
    else:
        out_w = _attend(
            q, k, v,
            dropout_rate=cfg.transformer_dropout_rate,
            key=key,
            enable_dropout=enable_dropout,
            fast_rng=cfg.fast_dropout_rng,
        )  # (B, num_windows, window, H*hd)
    out_w = nn.linear(out_w, p["out"])  # (B, num_windows, window, D)

    # Overlap-average in padded coordinates (reference scatter at
    # model.py:453-469), then crop to the first seq_len padded positions —
    # reproducing the dropped out-of-range indices and the pad_l shift.
    first = out_w[:, :, :stride, :]   # window k's contribution to block k
    second = out_w[:, :, stride:, :]  # window k's contribution to block k+1
    zeros = jnp.zeros((b, 1, stride, d), out_w.dtype)
    block_sum = jnp.concatenate([first, zeros], axis=1) + jnp.concatenate(
        [zeros, second], axis=1
    )  # (B, num_blocks, stride, D)
    count = jnp.ones((num_blocks,), x.dtype).at[1:-1].set(2.0)
    avg = block_sum / count[None, :, None, None]
    return avg.reshape(b, padded, d)[:, :seq_len, :]
