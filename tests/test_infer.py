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


def test_stitch_chunk_bit_identical_to_batch():
    """Chunked stitching (ops/stitch.stitch_chunk) emits EXACTLY the batch
    stitcher's rows — including the non-integral-overlap case where the
    float-accumulated bases are non-uniform."""
    from audio_to_midi_tpu.ops.stitch import (
        stitch_chunk, stitch_chunk_plan, stitch_probs_parallel,
    )

    rng = np.random.default_rng(0)
    fpw, e = 50, 7
    for overlap, dpf in ((0.1, 0.01), (0.1003, 0.01), (0.0, 0.01)):
        probs = rng.random((11, fpw, e)).astype(np.float32)
        batch = np.asarray(stitch_probs_parallel(jnp.asarray(probs), overlap, dpf))
        d_all, own_all, output_frames, ov = stitch_chunk_plan(11, fpw, overlap, dpf)
        segs = []
        prev = jnp.zeros((fpw, e), jnp.float32)
        for w0 in range(0, 11, 4):
            chunk = jnp.asarray(probs[w0 : w0 + 4])
            d = tuple(int(x) for x in d_all[w0 : w0 + chunk.shape[0]])
            own = tuple(int(x) for x in own_all[w0 : w0 + chunk.shape[0]])
            segs.append(
                np.asarray(stitch_chunk(prev, chunk, d=d, own=own, ov=ov, first=w0 == 0))
            )
            prev = chunk[-1]
        out = np.concatenate(segs)
        out = np.pad(out, ((0, output_frames - out.shape[0]), (0, 0)))
        if float(overlap / dpf) == int(overlap / dpf):
            # Integral overlap (the production geometries: 0.5 s / 0.25 s at
            # 20 ms frames): bitwise identical.
            np.testing.assert_array_equal(out, batch, err_msg=f"overlap={overlap}")
        else:
            # Non-integral overlap frames: the two XLA programs may contract
            # the blend FMA differently — equal to 1 ulp.
            np.testing.assert_allclose(
                out, batch, rtol=2.4e-7, atol=6e-8, err_msg=f"overlap={overlap}"
            )


def test_transcribe_file_streaming_matches_batch(tmp_path):
    """transcribe_file(stream) == transcribe_file: same stitched probs and
    the SAME MIDI events, with the transfer/compute pipelined per chunk."""
    events = synthetic.random_events(4.0, 6, seed=3)
    audio = synthetic.synth_performance(events, 4.0, CFG.data.sample_rate)
    f = tmp_path / "long.wav"
    audio_io.write_wav(f, audio, CFG.data.sample_rate)

    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG.model)
    stitched_batch, dpf_b, ev_batch = infer.transcribe_file(params, CFG, f, overlap=0.1)

    stage = {}
    segments = []
    stitched_s, dpf_s, ev_s = infer.transcribe_file_streaming(
        params, CFG, f, overlap=0.1, chunk_windows=4,
        stage_times=stage, on_segment=lambda w0, seg: segments.append((w0, seg)),
    )
    assert dpf_s == dpf_b
    assert stitched_s.shape == stitched_batch.shape
    np.testing.assert_allclose(stitched_s, stitched_batch, rtol=2e-6, atol=2e-7)
    assert ev_s == ev_batch
    assert len(segments) == 3  # 10 windows / 4 per chunk
    assert stage["first_segment_s"] is not None
    assert stage["first_segment_s"] <= stage["total_s"]


def test_transcribe_streaming_overlap_fallback(tmp_path):
    """Overlap past the pairwise precondition falls back to the batch path
    (identical results, no crash)."""
    events = synthetic.random_events(1.5, 3, seed=4)
    audio = synthetic.synth_performance(events, 1.5, CFG.data.sample_rate)
    f = tmp_path / "x.wav"
    audio_io.write_wav(f, audio, CFG.data.sample_rate)
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG.model)
    # overlap 0.3 of a 0.5 s window -> stride 320 <= ceil(480): chained blends
    stitched_s, dpf, ev = infer.transcribe_file_streaming(
        params, CFG, f, overlap=0.3, chunk_windows=4
    )
    stitched_b, _, ev_b = infer.transcribe_file(params, CFG, f, overlap=0.3)
    np.testing.assert_array_equal(stitched_s, stitched_b)
    assert ev == ev_b
