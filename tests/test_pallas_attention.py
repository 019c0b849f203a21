"""Pallas fused-attention kernel vs the XLA formulation (interpret mode on
CPU), plus model-level equivalence of the pallas/xla attention_impl paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models import attention, model as model_lib
from audio_to_midi_tpu.ops.pallas_attention import _xla_reference, fused_attention


@pytest.mark.parametrize("s,block", [(250, 0), (37, 0), (496, 16), (64, 16)])
def test_fused_attention_matches_xla(s, block):
    g, h, hd = 2, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (g, h, s, hd))
    k = jax.random.normal(ks[1], (g, h, s, hd))
    v = jax.random.normal(ks[2], (g, h, s, hd))
    out = fused_attention(q, k, v, block)
    ref = _xla_reference(q, k, v, block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_attention_grad_matches_xla():
    g, h, s, hd = 1, 2, 40, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (g, h, s, hd))
    k = jax.random.normal(ks[1], (g, h, s, hd))
    v = jax.random.normal(ks[2], (g, h, s, hd))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, 0) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


CFG_XLA = ModelConfig(
    dims=(4, 8),
    depths=(1, 1),
    num_transformer_layers=1,
    num_transformer_heads=2,
    attention_size=8,
    compressed_attention_kv_size=8,
    compressed_attention_q_size=8,
    attention_impl="xla",
)
CFG_PALLAS = dataclasses.replace(CFG_XLA, attention_impl="pallas")


def test_model_pallas_vs_xla_paths():
    """Same params through both attention implementations — same outputs."""
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 400))
    a = model_lib.forward(params, CFG_XLA, audio, rope)[0]
    b = model_lib.forward(params, CFG_PALLAS, audio, rope)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_local_attention_pallas_matches_xla():
    p = attention.init_self_attention(jax.random.PRNGKey(3), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 50, 8))
    a = attention.local_self_attention(x, p, rope, CFG_XLA)
    b = attention.local_self_attention(x, p, rope, CFG_PALLAS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


CFG_BLOCK = dataclasses.replace(CFG_XLA, attention_impl="pallas_block")


def test_model_pallas_block_vs_xla_paths():
    """The whole-block megakernel path matches the einsum path end to end."""
    params, _ = model_lib.init(jax.random.PRNGKey(5), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    audio = jax.random.normal(jax.random.PRNGKey(6), (2, 2, 400))
    a = model_lib.forward(params, CFG_XLA, audio, rope)[0]
    b = model_lib.forward(params, CFG_BLOCK, audio, rope)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_pallas_block_grad_matches_xla():
    params, _ = model_lib.init(jax.random.PRNGKey(7), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    audio = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 200))

    def loss(p, cfg):
        return jnp.sum(model_lib.forward(p, cfg, audio, rope)[0] ** 2)

    ga = jax.grad(lambda p: loss(p, CFG_XLA))(params)
    gb = jax.grad(lambda p: loss(p, CFG_BLOCK))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
