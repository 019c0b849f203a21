"""ConvNeXt whole-stage megakernel (ops/pallas_convnext.py) vs the scanned
XLA formulation — forward (bit-exact in f32) and gradients, plus the
small-C / SDD fallback gates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models.convnext import cnn_forward, init_cnn
from audio_to_midi_tpu.ops.pallas_convnext import stage_supported

CFG = ModelConfig(
    dims=(8, 64, 128),
    depths=(2, 3, 4),
    num_transformer_layers=1,
    num_transformer_heads=2,
    attention_size=8,
    compressed_attention_kv_size=8,
    compressed_attention_q_size=8,
    rope_max_positions=128,
)
CFG_XLA = dataclasses.replace(CFG, cnn_impl="xla")
CFG_STAGE = dataclasses.replace(CFG, cnn_impl="pallas_stage")


def test_stage_kernel_forward_matches_xla():
    params = init_cnn(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1000, 2))
    a = cnn_forward(x, params, CFG_XLA)
    b = cnn_forward(x, params, CFG_STAGE)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-6)


def test_stage_kernel_unaligned_length():
    """L not a multiple of 8 exercises the pad + valid-row masking."""
    cfg = dataclasses.replace(CFG, dims=(8, 64), depths=(1, 2))
    params = init_cnn(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1230, 2))
    a = cnn_forward(x, params, dataclasses.replace(cfg, cnn_impl="xla"))
    b = cnn_forward(x, params, dataclasses.replace(cfg, cnn_impl="pallas_stage"))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-6)


def test_stage_kernel_grads_match_xla():
    params = init_cnn(jax.random.PRNGKey(4), CFG)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1000, 2))

    def loss(p, cfg):
        return jnp.sum(cnn_forward(x, p, cfg) ** 2)

    ga = jax.grad(loss)(params, CFG_XLA)
    gb = jax.grad(loss)(params, CFG_STAGE)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-4
        )


def test_stage_gates():
    assert stage_supported(500, 128, 21)
    assert stage_supported(1000, 64, 3)
    assert not stage_supported(16000, 4, 3)   # small-C early stage -> XLA
    assert not stage_supported(8000, 8, 3)


def test_packed_small_c_stages_match_xla():
    """Packed (space-to-depth) early stages (models/convnext_packed.py):
    stem, Toeplitz depthwise, block-diag pointwise, packed downsample and the
    packed->natural transition all match the scanned XLA path."""
    cfg = dataclasses.replace(
        CFG, dims=(4, 8, 16, 64), depths=(2, 2, 2, 2)
    )
    params = init_cnn(jax.random.PRNGKey(8), cfg)
    # L=8000: stem/5 -> 1600 (f=32: 50 rows), /2 -> 800 (f=16), /2 -> 400
    # (f=8), /2 -> 200 at C=64 (stage-kernel path).
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8000, 2))
    a = cnn_forward(x, params, dataclasses.replace(cfg, cnn_impl="xla"))
    b = cnn_forward(x, params, cfg)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-5, atol=3e-6)


def test_packed_grads_match_xla():
    cfg = dataclasses.replace(CFG, dims=(4, 8), depths=(2, 2))
    params = init_cnn(jax.random.PRNGKey(10), cfg)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 4000, 2))

    def loss(p, c):
        return jnp.sum(cnn_forward(x, p, c) ** 2)

    ga = jax.grad(loss)(params, dataclasses.replace(cfg, cnn_impl="xla"))
    gb = jax.grad(loss)(params, cfg)
    gmax = max(float(np.max(np.abs(np.asarray(l)))) for l in jax.tree.leaves(ga))
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        # Normalize by max(leaf, 1e-3*global): leaves whose grads the 1e-6
        # layer-scale squashes to ~0 are numerically ill-conditioned in both
        # formulations and only meaningful relative to the global scale.
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1e-3 * gmax) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-4
        )


def test_sdd_path_falls_back():
    """With CNN stochastic depth enabled the scanned XLA path must run
    (the kernel has no RNG) — outputs differ from the no-dropout path."""
    cfg = dataclasses.replace(CFG, enable_cnn_stochastic_depth=True, sdd_rate=0.9)
    params = init_cnn(jax.random.PRNGKey(6), cfg)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 1000, 2))
    base = cnn_forward(x, params, cfg)
    dropped = cnn_forward(
        x, params, cfg, key=jax.random.PRNGKey(8), enable_dropout=True
    )
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
