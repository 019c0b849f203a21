"""Inference-path tests: fused vs unfused equality and long-file chunked
streaming."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_to_midi_tpu import infer
from audio_to_midi_tpu.data import audio_io, labels, synthetic
from audio_to_midi_tpu.models import model as model_lib
from tests.test_e2e import E2E_CFG

CFG = E2E_CFG


def test_fused_matches_unfused():
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG.model)
    rope = model_lib.make_rope(CFG.model)
    windows = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (3, 2, CFG.data.samples_per_window))
    )
    _probs, stitched_a, dpf = infer.predict_and_stitch(
        params, CFG, windows, CFG.data.model_audio_length, overlap=0.1, rope=rope
    )
    stitched_b = np.asarray(
        infer.predict_and_stitch_fused(
            params, CFG.model, jnp.asarray(windows), rope,
            CFG.data.model_audio_length, 0.1,
        )
    )
    np.testing.assert_allclose(stitched_a, stitched_b, rtol=1e-5, atol=1e-6)


def test_transcribe_samples_fused_matches_host_pipeline(tmp_path):
    """The single-program frontend+model+stitch must match the host path."""
    import dataclasses

    from audio_to_midi_tpu.config import PrecisionConfig

    cfg = dataclasses.replace(CFG, precision=PrecisionConfig(compute_dtype=jnp.float32))
    events = synthetic.random_events(1.5, 4, seed=7)
    audio = synthetic.synth_performance(events, 1.5, cfg.data.sample_rate)
    f = tmp_path / "x.wav"
    audio_io.write_wav(f, audio, cfg.data.sample_rate)

    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    rope = model_lib.make_rope(cfg.model)

    # host path: decode (incl. 16-bit PCM round trip) + normalize + window
    stitched_host, _, _ = infer.transcribe_file(params, cfg, f, overlap=0.1)

    # fused path from the same decoded-but-unnormalized samples
    raw = audio_io.decode_audio(f, cfg.data.sample_rate)
    stitched_fused = np.asarray(
        infer.transcribe_samples_fused(
            params, cfg, jnp.asarray(raw), rope,
            src_rate=cfg.data.sample_rate,
            window_duration=cfg.data.model_audio_length,
            overlap=0.1,
        )
    )
    # kernel vs XLA softmax accumulation differ in the last few f32 ulps
    np.testing.assert_allclose(stitched_host, stitched_fused, rtol=5e-3, atol=2e-3)


def test_transcribe_long_file_chunked(tmp_path):
    """A file long enough to need several window batches streams correctly:
    the chunked path must agree with the single-batch fused path."""
    events = synthetic.random_events(4.0, 6, seed=2)
    audio = synthetic.synth_performance(events, 4.0, CFG.data.sample_rate)
    f = tmp_path / "long.wav"
    audio_io.write_wav(f, audio, CFG.data.sample_rate)

    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG.model)
    # 0.5 s windows, 0.1 s overlap -> 10 windows; chunk size 4 forces 3 batches
    stitched_chunked, dpf, ev_chunked = infer.transcribe_file(
        params, CFG, f, overlap=0.1, max_windows_per_batch=4
    )
    stitched_full, _, ev_full = infer.transcribe_file(
        params, CFG, f, overlap=0.1, max_windows_per_batch=1000
    )
    np.testing.assert_allclose(stitched_chunked, stitched_full, rtol=1e-5, atol=1e-6)
    assert ev_chunked == ev_full
