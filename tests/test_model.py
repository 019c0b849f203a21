"""Model structure/shape tests + golden test of the local-attention quirk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models import attention, model, nn
from audio_to_midi_tpu.models.rope import precompute_frequencies


SMALL = ModelConfig(
    dims=(4, 8),
    depths=(1, 1),
    num_transformer_layers=2,
    num_transformer_heads=2,
    attention_size=8,
    compressed_attention_kv_size=8,
    compressed_attention_q_size=8,
)


def test_small_model_shapes():
    params, state = model.init(jax.random.PRNGKey(0), SMALL)
    rope = model.make_rope(SMALL)
    audio = jnp.zeros((2, 2, 100))  # B=2, stereo, 100 samples
    logits, probs = model.forward(params, SMALL, audio, rope)
    # stem /5 -> 20, one /2 downsample -> 10 frames
    assert logits.shape == (2, 10, 90)
    assert probs.shape == (2, 10, 90)
    assert bool(jnp.all(probs >= 0)) and bool(jnp.all(probs <= 1))


def test_default_model_geometry_and_param_count():
    cfg = ModelConfig()
    params, _ = model.init(jax.random.PRNGKey(0), cfg)
    n = model.param_count(params)
    # Survey-derived estimate: ~11.6M params (CNN 2.37M + transformer
    # 16x575,744 + decoder 23.6k).  Guard tightly enough to catch a missing
    # projection or an extra bias.
    assert 11_000_000 < n < 12_200_000, n
    assert cfg.output_frames(80_000) == 250
    assert cfg.total_downsample == 320


def test_output_frame_probe_matches_static():
    params, _ = model.init(jax.random.PRNGKey(0), SMALL)
    assert model.compute_model_output_frames(params, SMALL, 100) == SMALL.output_frames(100)


def test_default_forward_output_shape():
    cfg = ModelConfig()
    params, _ = model.init(jax.random.PRNGKey(0), cfg)
    rope = model.make_rope(cfg)
    audio = jnp.zeros((1, 2, 80_000), jnp.float32)
    logits, probs = jax.jit(
        lambda p, a: model.forward(p, cfg, a, rope)
    )(params, audio)
    assert logits.shape == (1, 250, 90)


def test_dropout_changes_output_only_when_enabled():
    params, _ = model.init(jax.random.PRNGKey(0), SMALL)
    rope = model.make_rope(SMALL)
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 100))
    base = model.forward(params, SMALL, audio, rope)[0]
    again = model.forward(params, SMALL, audio, rope)[0]
    np.testing.assert_array_equal(base, again)
    dropped = model.forward(
        params, SMALL, audio, rope,
        key=jax.random.PRNGKey(2), enable_dropout=True,
    )[0]
    assert not np.allclose(base, dropped)


def test_fast_rng_dropout_semantics():
    """fast_dropout_rng=True draws masks from the RBG bit generator: same
    keep-rate statistics and inverted scaling as the threefry path, key-
    reproducible, key-sensitive, and differentiable (the default train
    config uses it — STEPTIME round 4 measured -4.4 ms/step)."""
    from audio_to_midi_tpu.models import nn

    x = jnp.ones((512, 257), jnp.float32)
    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    y1 = nn.dropout(x, 0.25, k1, True, fast_rng=True)
    y1b = nn.dropout(x, 0.25, k1, True, fast_rng=True)
    y2 = nn.dropout(x, 0.25, k2, True, fast_rng=True)
    np.testing.assert_array_equal(y1, y1b)  # reproducible per key
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))  # key-sensitive
    vals = np.unique(np.asarray(y1))
    np.testing.assert_allclose(vals, [0.0, 1.0 / 0.75], rtol=1e-6)
    keep = float((np.asarray(y1) != 0).mean())
    assert abs(keep - 0.75) < 0.02
    # Inert when disabled / rate 0, and grads flow where kept.
    np.testing.assert_array_equal(nn.dropout(x, 0.25, k1, False, fast_rng=True), x)
    g = jax.grad(lambda a: nn.dropout(a, 0.25, k1, True, fast_rng=True).sum())(x)
    np.testing.assert_array_equal(np.asarray(g) != 0, np.asarray(y1) != 0)
    # Works under jit + vmap with split keys (the production use).
    ks = jax.random.split(k1, 4)
    ys = jax.jit(jax.vmap(lambda k: nn.dropout(x, 0.25, k, True, fast_rng=True)))(ks)
    masks = np.asarray(ys) != 0
    assert all(
        not np.array_equal(masks[i], masks[j])
        for i in range(4) for j in range(i + 1, 4)
    )


# ---------------------------------------------------------------------------
# Local attention: compare the reshape-based overlap-average against a direct
# port of the reference's scatter formulation (model.py:409-471), including
# the padded-coordinate shift quirk and dropped out-of-range indices.
# ---------------------------------------------------------------------------


def _reference_local_attention(x, p, rope, cfg):
    """Direct translation of reference model.py:409-471 semantics (1 sample)."""
    seq_len, hidden_dim = x.shape
    window = cfg.local_context_window
    stride = window // 2

    required = stride - (seq_len - window) % stride
    if required != stride:
        lo = required // 2
        hi = required - required // 2
        x = jnp.pad(x, ((lo, hi), (0, 0)))

    num_windows = (x.shape[0] - window) // stride + 1
    starts = jnp.arange(num_windows) * stride

    def get_window(s):
        return jax.lax.dynamic_slice(x, (s, 0), (window, hidden_dim))

    input_windows = jax.vmap(get_window)(starts)  # (W, window, D)

    def attend(w):
        return attention.self_attention(w[None], p, rope, cfg)[0]

    out_windows = jax.vmap(attend)(input_windows)

    token_offsets = jnp.arange(window)
    all_idx = (starts[:, None] + token_offsets[None, :]).reshape(-1)
    flat_out = out_windows.reshape(-1, hidden_dim)

    output = jnp.zeros((seq_len, hidden_dim), x.dtype)
    count = jnp.zeros((seq_len,), x.dtype)
    output = output.at[all_idx].add(flat_out)  # OOB dropped by default
    count = count.at[all_idx].add(1)
    return output / count[:, None]


@pytest.mark.parametrize("seq_len", [250, 16, 24, 40])
def test_local_attention_matches_reference_scatter(seq_len):
    cfg = ModelConfig(
        dims=(4,), depths=(1,), num_transformer_layers=1,
        num_transformer_heads=2, attention_size=8,
        compressed_attention_kv_size=8, compressed_attention_q_size=8,
    )
    d = 4  # transformer_hidden_dim = dims[-1]
    key = jax.random.PRNGKey(3)
    p = attention.init_self_attention(key, cfg)
    rope = precompute_frequencies(cfg.attention_size, 300)
    x = jax.random.normal(jax.random.PRNGKey(4), (seq_len, d))

    ours = attention.local_self_attention(x[None], p, rope, cfg)[0]
    ref = _reference_local_attention(x, p, rope, cfg)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_f16_routes_to_xla_paths(monkeypatch):
    """Mosaic has no f16 support ("Unsupported type in mosaic dialect: 'f16'",
    hit on the r03 soak's f16 loss-scaling leg): every kernel-dispatch gate
    must fall back to the XLA attention paths for float16 activations."""
    cfg = ModelConfig(
        dims=(4,), depths=(1,), num_transformer_layers=1,
        num_transformer_heads=2, attention_size=8,
        compressed_attention_kv_size=8, compressed_attention_q_size=8,
    )
    p = attention.init_self_attention(jax.random.PRNGKey(3), cfg)
    rope = precompute_frequencies(cfg.attention_size, 600)

    def boom(*a, **k):
        raise AssertionError("pallas kernel dispatched for f16 input")

    for name in ("fused_attention_nhd_diff", "fused_local_two_phase",
                 "fused_local_two_phase_rw", "fused_local_two_phase_dropout",
                 "attend_nhd_dropout", "fused_attention_layer_diff"):
        monkeypatch.setattr(attention, name, boom)

    x16 = jax.random.normal(
        jax.random.PRNGKey(4), (1, 256, 4)
    ).astype(jnp.float16)
    p16 = jax.tree.map(lambda a: a.astype(jnp.float16), p)
    out = attention.local_self_attention(x16, p16, rope, cfg)
    assert out.dtype == jnp.float16
    out = attention.self_attention(x16, p16, rope, cfg)
    assert out.dtype == jnp.float16

    # Positive control: bf16 activations do dispatch the kernels.
    xb = x16.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    with pytest.raises(AssertionError, match="pallas kernel"):
        attention.local_self_attention(xb, pb, rope, cfg)
    with pytest.raises(AssertionError, match="pallas kernel"):
        attention.self_attention(xb, pb, rope, cfg)


def test_layer_norm_matches_manual_fp32():
    p = nn.init_layer_norm(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8), dtype=jnp.bfloat16)
    y = nn.layer_norm(x, p)
    xf = np.asarray(x, np.float32)
    expect = (xf - xf.mean(-1, keepdims=True)) / np.sqrt(xf.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(y, np.float32), expect, rtol=2e-2, atol=2e-2)
    assert y.dtype == jnp.bfloat16
