"""Transformer-pair megakernel (ops/pallas_pair.py) and two-phase local
attention (ops/pallas_attention.fused_local_two_phase) vs the XLA paths —
forward AND gradients, including the asymmetric local-padding quirk case.

The two-phase decomposition (phase A: windows at 0, w, 2w, …; phase B:
windows at w/2, 3w/2, …; average = reference's overlap-average) must
reproduce the reference's sliding-window semantics (model.py:377-471) bit
for bit in fp32, which these tests pin against the einsum formulation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models import attention, model as model_lib
from audio_to_midi_tpu.models.transformer import (
    _pair_kernel_applicable,
    init_transformer_stack,
    transformer_stack,
)

# Geometry satisfying the pair/two-phase gates (D % 128 == 0, P % 16 == 0)
# while staying small enough for interpret-mode CPU runs.
CFG_XLA = ModelConfig(
    dims=(4, 128),
    depths=(1, 1),
    num_transformer_layers=2,
    num_transformer_heads=2,
    attention_size=64,
    compressed_attention_kv_size=64,
    compressed_attention_q_size=64,
    rope_max_positions=128,
    attention_impl="xla",
)
CFG_PAIR = dataclasses.replace(CFG_XLA, attention_impl="pallas_pair")
CFG_PALLAS = dataclasses.replace(CFG_XLA, attention_impl="pallas")


@pytest.fixture(scope="module")
def stack_setup():
    rope = model_lib.make_rope(CFG_XLA)
    stacked = init_transformer_stack(jax.random.PRNGKey(1), CFG_XLA)
    return rope, stacked


# S=64: zero local padding; S=58: asymmetric (pad_l=3, pad_r=3) — exercises
# the reference's padded-coordinate shift quirk through the kernel.
@pytest.mark.parametrize("seq_len", [64, 58])
def test_pair_kernel_forward_matches_xla(stack_setup, seq_len):
    rope, stacked = stack_setup
    x = jax.random.normal(jax.random.PRNGKey(2), (2, seq_len, 128))
    assert _pair_kernel_applicable(CFG_PAIR, x, False)
    y_xla = transformer_stack(x, stacked, rope, CFG_XLA)
    y_pair = transformer_stack(x, stacked, rope, CFG_PAIR)
    np.testing.assert_allclose(
        np.asarray(y_pair), np.asarray(y_xla), rtol=2e-5, atol=2e-5
    )


def test_pair_kernel_grads_match_xla(stack_setup):
    rope, stacked = stack_setup
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 58, 128))

    def loss(params, cfg):
        return jnp.sum(transformer_stack(x, params, rope, cfg) ** 2)

    g_xla = jax.grad(loss)(stacked, CFG_XLA)
    g_pair = jax.grad(loss)(stacked, CFG_PAIR)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_pair_kernel_gate_falls_back():
    """Geometries the kernel doesn't support run the fallback path."""
    cfg_small = dataclasses.replace(
        CFG_PAIR,
        dims=(4, 16),
        attention_size=8,
        compressed_attention_kv_size=8,
        compressed_attention_q_size=8,
    )
    x = jnp.zeros((2, 50, 16))
    assert not _pair_kernel_applicable(cfg_small, x, False)
    rope = model_lib.make_rope(cfg_small)
    stacked = init_transformer_stack(jax.random.PRNGKey(4), cfg_small)
    out = transformer_stack(x, stacked, rope, cfg_small)
    assert out.shape == (2, 50, 16)


@pytest.mark.parametrize("seq_len", [64, 58, 61])
def test_two_phase_local_attention_matches_xla(seq_len):
    """local_self_attention pallas (two-phase kernel) vs einsum path."""
    p = attention.init_self_attention(jax.random.PRNGKey(5), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, seq_len, 128))
    a = attention.local_self_attention(x, p, rope, CFG_XLA)
    b = attention.local_self_attention(x, p, rope, CFG_PALLAS)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5)


def test_two_phase_local_attention_grads(seq_len=58):
    p = attention.init_self_attention(jax.random.PRNGKey(7), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, seq_len, 128))

    def loss(x, cfg):
        return jnp.sum(attention.local_self_attention(x, p, rope, cfg) ** 2)

    ga = jax.grad(loss)(x, CFG_XLA)
    gb = jax.grad(loss)(x, CFG_PALLAS)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=2e-4, atol=2e-4)


CFG_FUSED = dataclasses.replace(CFG_XLA, attention_impl="pallas_fused")


@pytest.mark.parametrize("seq_len", [64, 58])
def test_fused_sublayer_stack_matches_xla(stack_setup, seq_len):
    """pallas_fused: per-sublayer kernels (LN+proj+rope+attn+out-proj+res)."""
    rope, stacked = stack_setup
    x = jax.random.normal(jax.random.PRNGKey(12), (2, seq_len, 128))
    y_xla = transformer_stack(x, stacked, rope, CFG_XLA)
    y_f = transformer_stack(x, stacked, rope, CFG_FUSED)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_xla), rtol=2e-5, atol=2e-5)


def test_fused_sublayer_grads_match_xla(stack_setup):
    rope, stacked = stack_setup
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 58, 128))

    def loss(params, cfg):
        return jnp.sum(transformer_stack(x, params, rope, cfg) ** 2)

    g_xla = jax.grad(loss)(stacked, CFG_XLA)
    g_f = jax.grad(loss)(stacked, CFG_FUSED)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)
