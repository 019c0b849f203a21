"""Custom init surgery (reference train.py:573-644, disabled there) —
verifies exactly the reference's leaf selection and distributions."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.train.init_surgery import apply_init_surgery

CFG = ModelConfig(
    dims=(8, 16, 32),
    depths=(2, 2, 2),
    num_transformer_layers=2,
    num_transformer_heads=2,
    attention_size=16,
    compressed_attention_kv_size=16,
    compressed_attention_q_size=16,
    rope_max_positions=64,
)


def test_surgery_targets_and_distributions():
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG)
    out = apply_init_surgery(params, jax.random.PRNGKey(7), CFG.num_transformer_heads)

    # Attention projections re-drawn ~N(0, 0.2); out-proj untouched.
    for layer in range(CFG.num_transformer_layers):
        for side in ("local", "global"):
            att_old = params["transformer"][side]["attention"]
            att_new = out["transformer"][side]["attention"]
            for name in ("q_up", "kv_down", "k_up", "v_up"):
                w = np.asarray(att_new[name]["w"][layer])
                assert not np.allclose(w, np.asarray(att_old[name]["w"][layer]))
                assert abs(w.std() - 0.2) < 0.05, (name, w.std())
            np.testing.assert_array_equal(
                np.asarray(att_new["out"]["w"]), np.asarray(att_old["out"]["w"])
            )

    # Conv weights (stem/downsample/depthwise/pointwise) ~N(0,0.2), biases ~N(0,0.01).
    for i, stage in enumerate(out["cnn"]["stages"]):
        w = np.asarray(stage["down"]["conv"]["w"])
        assert abs(w.std() - 0.2) < 0.06, (i, w.std())
        b = np.asarray(stage["down"]["conv"]["b"])
        assert b.std() < 0.05
        for name in ("depth_conv", "pw1", "pw2"):
            bw = np.asarray(stage["blocks"][name]["w"])
            assert abs(bw.std() - 0.2) < 0.06, (i, name, bw.std())

    # Untouched: LN, gamma, FFN, decoder.
    np.testing.assert_array_equal(
        np.asarray(out["decoder"]["out"]["w"]), np.asarray(params["decoder"]["out"]["w"])
    )
    for side in ("local", "global"):
        np.testing.assert_array_equal(
            np.asarray(out["transformer"][side]["ff"]["in_proj"]["w"]),
            np.asarray(params["transformer"][side]["ff"]["in_proj"]["w"]),
        )


def test_surgery_forward_still_works():
    params, _ = model_lib.init(jax.random.PRNGKey(1), CFG)
    params = apply_init_surgery(params, jax.random.PRNGKey(2), CFG.num_transformer_heads)
    rope = model_lib.make_rope(CFG)
    audio = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 1000))
    logits, probs = model_lib.forward(params, CFG, audio, rope)
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert probs.shape == (1, CFG.output_frames(1000), 90)
