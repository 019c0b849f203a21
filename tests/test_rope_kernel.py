"""fused_rope_attention kernel (rope-in-VMEM variant) vs its jnp mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.ops.pallas_attention import (
    _rope_attention_reference,
    fused_rope_attention,
)


@pytest.mark.parametrize("s,block", [(50, 0), (96, 16)])
def test_fused_rope_attention_matches_reference(s, block):
    g, h, hd = 2, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (g, s, h * hd))
    k = jax.random.normal(ks[1], (g, s, h * hd))
    v = jax.random.normal(ks[2], (g, s, h * hd))
    pos = jnp.arange(128)[:, None] * 0.1 * (jnp.arange(hd // 2)[None, :] + 1)
    cos, sin = jnp.cos(pos), jnp.sin(pos)
    out = fused_rope_attention(q, k, v, cos, sin, h, block)
    ref = _rope_attention_reference(q, k, v, cos, sin, h, block)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_rope_attention_grads():
    g, s, h, hd = 1, 40, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (g, s, h * hd))
    k = jax.random.normal(ks[1], (g, s, h * hd))
    v = jax.random.normal(ks[2], (g, s, h * hd))
    pos = jnp.arange(64)[:, None] * 0.1 * (jnp.arange(hd // 2)[None, :] + 1)
    cos, sin = jnp.cos(pos), jnp.sin(pos)

    ga = jax.grad(lambda q: jnp.sum(fused_rope_attention(q, k, v, cos, sin, h, 0) ** 2))(q)
    gb = jax.grad(lambda q: jnp.sum(_rope_attention_reference(q, k, v, cos, sin, h, 0) ** 2))(q)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)
