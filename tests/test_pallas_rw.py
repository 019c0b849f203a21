"""Reduced-width two-phase local attention (fused_local_two_phase_rw):
exactness vs the wide-kernel jnp mirror, gradient exactness, and model-level
equivalence of attention_impl="pallas_rw" with the other paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.models import attention, model as model_lib
from audio_to_midi_tpu.ops.pallas_attention import (
    _two_phase_reference,
    fused_local_two_phase,
    fused_local_two_phase_rw,
)
from tests.test_pallas_attention import CFG_XLA

CFG_RW = dataclasses.replace(CFG_XLA, attention_impl="pallas_rw")


@pytest.mark.parametrize("b,p", [(2, 64), (1, 256)])
def test_rw_matches_wide_reference(b, p):
    h, hd, window = 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    qa, ka, qb, kb, v = (jax.random.normal(k, (b, p, h * hd)) for k in ks)
    out = fused_local_two_phase_rw(qa, ka, qb, kb, v, h, window)
    ref = _two_phase_reference(qa, ka, qb, kb, v, h, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    wide = fused_local_two_phase(qa, ka, qb, kb, v, h, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(wide), rtol=2e-5, atol=2e-5)


def test_rw_grads_match_reference():
    b, p, h, hd, window = 1, 32, 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    qa, ka, qb, kb, v = (jax.random.normal(k, (b, p, h * hd)) for k in ks)

    def loss_rw(*a):
        return jnp.sum(fused_local_two_phase_rw(*a, h, window) ** 2)

    def loss_ref(*a):
        return jnp.sum(_two_phase_reference(*a, h, window) ** 2)

    ga = jax.grad(loss_rw, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    gb = jax.grad(loss_ref, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_local_attention_rw_matches_xla():
    p = attention.init_self_attention(jax.random.PRNGKey(3), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    # padded%16==0 geometry so the two-phase gate engages (seq 46 -> 48).
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 46, 8))
    a = attention.local_self_attention(x, p, rope, CFG_XLA)
    b = attention.local_self_attention(x, p, rope, CFG_RW)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_model_rw_vs_xla_paths():
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 400))
    a = model_lib.forward(params, CFG_XLA, audio, rope)[0]
    b = model_lib.forward(params, CFG_RW, audio, rope)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
