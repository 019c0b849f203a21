"""Pallas backward kernels (ops/pallas_attention.py): gradient exactness of
the kernel backward vs the XLA-mirror vjp for the natural-layout and
two-phase local attention cores (with and without dropout bits the dropout
tests already cover), plus the A2M_PALLAS_BWD=0 fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.ops import pallas_attention as pa


def _nhd_inputs(g=2, s=250, h=2, hd=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q, k, v = (jax.random.normal(kk, (g, s, h * hd)) for kk in ks[:3])
    return q, k, v


@pytest.mark.parametrize("s,block", [(250, 0), (128, 16), (96, 16)])
def test_nhd_backward_kernel_matches_mirror(s, block, monkeypatch):
    h, hd = 2, 8
    q, k, v = _nhd_inputs(s=s, h=h, hd=hd)

    def loss(q, k, v):
        return jnp.sum(pa.fused_attention_nhd_diff(q, k, v, h, block) ** 2)

    ga = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("A2M_PALLAS_BWD", "0")
    gb = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_two_phase_backward_kernel_matches_mirror(monkeypatch):
    b, p, h, hd, window = 2, 64, 2, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    qa, ka, qb, kb, v = (jax.random.normal(k, (b, p, h * hd)) for k in ks)

    def loss(*a):
        return jnp.sum(pa.fused_local_two_phase(*a, h, window) ** 2)

    ga = jax.grad(loss, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    monkeypatch.setenv("A2M_PALLAS_BWD", "0")
    gb = jax.grad(loss, argnums=tuple(range(5)))(qa, ka, qb, kb, v)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_model_grads_with_bwd_kernels():
    """Model-level: grads through the default (pallas) path with backward
    kernels match the XLA path — same tolerance as the forward parity test."""
    from audio_to_midi_tpu.models import model as model_lib
    from tests.test_pallas_attention import CFG_PALLAS, CFG_XLA

    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG_XLA)
    rope = model_lib.make_rope(CFG_XLA)
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 400))

    def loss(p, cfg):
        return jnp.sum(model_lib.forward(p, cfg, audio, rope)[0] ** 2)

    ga = jax.grad(lambda p: loss(p, CFG_XLA))(params)
    gb = jax.grad(lambda p: loss(p, CFG_PALLAS))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
