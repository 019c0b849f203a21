"""In-kernel attention-weight dropout (ops/pallas_attention.py dropout
kernels): forward/grad exactness vs the XLA mirror with identical bits, the
statistical drop rate, unbiasedness, and the model-level routing that keeps
the reference-parity training config (dropout 0.1, model.py:31) on the Pallas
kernels."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.models import attention, model as model_lib
from audio_to_midi_tpu.ops.pallas_attention import (
    _apply_bits,
    _two_phase_reference_bits,
    _xla_reference_nhd_bits,
    attend_nhd_dropout,
    dropout_threshold,
    fused_attention_nhd_diff,
    fused_attention_nhd_dropout,
    fused_local_two_phase_dropout,
)
from tests.test_pallas_attention import CFG_XLA


def _qkv(g=2, s=128, h=2, hd=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (g, s, h * hd))
    k = jax.random.normal(ks[1], (g, s, h * hd))
    v = jax.random.normal(ks[2], (g, s, h * hd))
    return q, k, v


def test_nhd_dropout_kernel_matches_xla_mirror():
    g, s, h, hd = 2, 128, 2, 8
    q, k, v = _qkv(g, s, h, hd)
    t = dropout_threshold(0.1)
    bits = jax.random.bits(jax.random.PRNGKey(7), (g, h, s, s), dtype=jnp.uint8)
    out = fused_attention_nhd_dropout(q, k, v, bits, h, 0, t, s)
    ref = _xla_reference_nhd_bits(q, k, v, bits, h, 0, t, valid_len=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_nhd_dropout_grads_match_xla_mirror():
    g, s, h, hd = 1, 128, 2, 8
    q, k, v = _qkv(g, s, h, hd, seed=1)
    t = dropout_threshold(0.1)
    bits = jax.random.bits(jax.random.PRNGKey(8), (g, h, s, s), dtype=jnp.uint8)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_nhd_dropout(q, k, v, bits, h, 0, t, s) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _xla_reference_nhd_bits(q, k, v, bits, h, 0, t, valid_len=s) ** 2
        )

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_two_phase_dropout_matches_xla_mirror():
    b, p, h, hd, window = 2, 64, 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    qa, ka, qb, kb, v = (jax.random.normal(k, (b, p, h * hd)) for k in ks)
    t = dropout_threshold(0.1)
    bits = jax.random.bits(jax.random.PRNGKey(9), (2, b, h, p, p), dtype=jnp.uint8)
    out = fused_local_two_phase_dropout(
        qa, ka, qb, kb, v, bits[0], bits[1], h, window, t
    )
    ref = _two_phase_reference_bits(
        qa, ka, qb, kb, v, bits[0], bits[1], h, window, t
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_two_phase_dropout_grads_match_xla_mirror():
    b, p, h, hd, window = 1, 32, 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    qa, ka, qb, kb, v = (jax.random.normal(k, (b, p, h * hd)) for k in ks)
    t = dropout_threshold(0.1)
    bits = jax.random.bits(jax.random.PRNGKey(10), (2, b, h, p, p), dtype=jnp.uint8)

    def loss_fused(*a):
        return jnp.sum(
            fused_local_two_phase_dropout(*a, bits[0], bits[1], h, window, t) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(
            _two_phase_reference_bits(*a, bits[0], bits[1], h, window, t) ** 2
        )

    ga = jax.grad(loss_fused, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    gb = jax.grad(loss_ref, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_statistical_drop_rate():
    """Thresholded uint8 bits realize dropout at rate threshold/256."""
    rate = 0.1
    t = dropout_threshold(rate)
    assert t == 26  # 0.1016 quantized — documented 1/256 granularity
    bits = jax.random.bits(jax.random.PRNGKey(11), (512, 512), dtype=jnp.uint8)
    w = jnp.ones((512, 512), jnp.float32)
    dropped = np.asarray(_apply_bits(w, bits, t)) == 0.0
    emp = dropped.mean()
    expect = t / 256.0
    # 512*512 Bernoulli draws: 5 sigma ~ 0.003
    assert abs(emp - expect) < 0.004, (emp, expect)
    # kept weights are scaled by 1/keep (inverted dropout)
    kept = np.asarray(_apply_bits(w, bits, t))[~dropped]
    np.testing.assert_allclose(kept, 256.0 / (256.0 - t), rtol=1e-6)


def test_dropout_attention_is_unbiased():
    """E[dropout attention] over keys ~= dropout-free attention (inverted
    dropout unbiasedness, through the linear V matmul)."""
    g, s, h, hd = 1, 128, 2, 8
    q, k, v = _qkv(g, s, h, hd, seed=4)
    base = fused_attention_nhd_diff(q, k, v, h, 0)
    acc = jnp.zeros_like(base)
    n = 64
    for i in range(n):
        acc = acc + attend_nhd_dropout(q, k, v, jax.random.PRNGKey(100 + i), h, 0.1)
    mean = np.asarray(acc / n)
    # Statistical tolerance: weights ~O(1/s), v ~N(0,1); SE ~ 1/sqrt(n).
    np.testing.assert_allclose(mean, np.asarray(base), atol=0.15)


CFG_PALLAS = dataclasses.replace(CFG_XLA, attention_impl="pallas")


def test_local_attention_dropout_stays_on_kernel_path():
    """Reference-parity config (dropout 0.1): the two-phase dropout kernel
    runs (geometry padded%16==0), output differs from the dropout-free one,
    and gradients flow."""
    p = attention.init_self_attention(jax.random.PRNGKey(3), CFG_PALLAS)
    rope = model_lib.make_rope(CFG_PALLAS)
    # seq 46 -> pad (1,1) -> padded 48, divisible by window 16.
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 46, 8))
    out_nodrop = attention.local_self_attention(x, p, rope, CFG_PALLAS)
    out_drop = attention.local_self_attention(
        x, p, rope, CFG_PALLAS, key=jax.random.PRNGKey(5), enable_dropout=True
    )
    assert np.isfinite(np.asarray(out_drop)).all()
    assert not np.allclose(np.asarray(out_drop), np.asarray(out_nodrop))

    def loss(p):
        return jnp.sum(
            attention.local_self_attention(
                x, p, rope, CFG_PALLAS, key=jax.random.PRNGKey(5),
                enable_dropout=True,
            )
            ** 2
        )

    grads = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_global_attention_dropout_kernel_path():
    p = attention.init_self_attention(jax.random.PRNGKey(6), CFG_PALLAS)
    rope = model_lib.make_rope(CFG_PALLAS)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 250, 8))
    out_drop = attention.self_attention(
        x, p, rope, CFG_PALLAS, key=jax.random.PRNGKey(8), enable_dropout=True
    )
    out_nodrop = attention.self_attention(x, p, rope, CFG_PALLAS)
    assert np.isfinite(np.asarray(out_drop)).all()
    assert not np.allclose(np.asarray(out_drop), np.asarray(out_nodrop))


def test_sub_quantum_dropout_rate_routes_to_xla():
    """A nonzero rate below 1/512 quantizes to threshold 0; the kernels
    would silently run dropout-FREE, so such configs must take the XLA path
    (nn.dropout at the exact rate).  Same key => bitwise-equal outputs
    between attention_impl='pallas' and 'xla'."""
    tiny = dataclasses.replace(CFG_PALLAS, transformer_dropout_rate=1 / 600)
    tiny_xla = dataclasses.replace(tiny, attention_impl="xla")
    assert dropout_threshold(tiny.transformer_dropout_rate) == 0
    p = attention.init_self_attention(jax.random.PRNGKey(9), tiny)
    rope = model_lib.make_rope(tiny)
    key = jax.random.PRNGKey(10)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 46, 8))
    a = attention.local_self_attention(x, p, rope, tiny, key=key, enable_dropout=True)
    b = attention.local_self_attention(
        x, p, rope, tiny_xla, key=key, enable_dropout=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    xg = jax.random.normal(jax.random.PRNGKey(12), (2, 250, 8))
    a = attention.self_attention(xg, p, rope, tiny, key=key, enable_dropout=True)
    b = attention.self_attention(xg, p, rope, tiny_xla, key=key, enable_dropout=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fmix32_matches_murmur3_finalizer():
    """`_prng_bits` folds (sample, core) into the two hardware-PRNG seed
    words via `_fmix32`; its constants/shifts must stay the murmur3 fmix32
    finalizer (full avalanche) or per-core dropout streams decorrelate
    poorly.  Checked against a pure-python uint32 reference."""
    from audio_to_midi_tpu.ops.pallas_attention import _fmix32

    def fmix32_py(h):
        h &= 0xFFFFFFFF
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h

    xs = np.array(
        [0, 1, 2, 255, 256, 257, 2**31 - 1, -1, -2**31, 123456789, -987654321],
        dtype=np.int32,
    )
    got = np.asarray(jax.jit(_fmix32)(jnp.asarray(xs))).astype(np.uint32)
    want = np.array([fmix32_py(int(np.uint32(x))) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)

    # The seed-fold chain must give adjacent (sample, core) ids distinct,
    # well-mixed seed words: all folds distinct, and every output differs
    # from its neighbour in >= 8 of 32 bits (avalanche sanity).
    ids = np.arange(0, 4096, dtype=np.int32)
    folds = np.asarray(jax.jit(_fmix32)(jnp.asarray(ids))).astype(np.uint32)
    assert len(np.unique(folds)) == len(folds)
    flips = np.unpackbits(
        (folds[1:] ^ folds[:-1]).view(np.uint8).reshape(-1, 4), axis=1
    ).sum(axis=1)
    assert flips.min() >= 8


def test_keep_nothing_dropout_rate_routes_to_xla():
    """Rates quantizing to threshold 256 (keep NOTHING) must route to the
    XLA path: _apply_bits's inverted scaling divides by (256 - threshold),
    so the kernels cannot express them, while nn.dropout zeroes cleanly."""
    from audio_to_midi_tpu.ops.pallas_attention import _apply_bits

    full = dataclasses.replace(CFG_PALLAS, transformer_dropout_rate=1.0)
    assert dropout_threshold(full.transformer_dropout_rate) == 256
    with pytest.raises(ValueError, match="threshold"):
        _apply_bits(jnp.ones((4, 4), jnp.float32), jnp.zeros((4, 4), jnp.uint8), 256)
    p = attention.init_self_attention(jax.random.PRNGKey(0), full)
    rope = model_lib.make_rope(full)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 46, 8))
    out = attention.local_self_attention(x, p, rope, full, key=key, enable_dropout=True)
    assert np.isfinite(np.asarray(out)).all()
    xg = jax.random.normal(jax.random.PRNGKey(3), (2, 250, 8))
    out = attention.self_attention(xg, p, rope, full, key=key, enable_dropout=True)
    assert np.isfinite(np.asarray(out)).all()
