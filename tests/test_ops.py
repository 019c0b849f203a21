"""Golden tests: vectorized on-device ops vs sequential reference-semantics
ports (tests/golden.py) and the numpy rasterizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.ops import eventize, rasterize, stitch
from tests.golden import golden_extract_events, golden_stitch_probs


def _make_probs(seed, num_frames=120, num_keys=12, smooth=True):
    rng = np.random.default_rng(seed)
    p = rng.random((num_frames, num_keys)).astype(np.float32)
    if smooth:
        # Piano-roll-like: sparse notes with decaying envelopes + noise
        p = p * 0.15
        for _ in range(30):
            f = rng.integers(0, num_frames - 1)
            k = rng.integers(0, num_keys)
            dur = rng.integers(3, 25)
            env = np.maximum(np.exp(-0.05 * np.arange(dur)), 0.6)
            hi = min(num_frames, f + dur)
            p[f:hi, k] = np.maximum(p[f:hi, k], env[: hi - f])
    return np.clip(p, 0.0, 1.0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("smooth", [True, False])
def test_extract_events_matches_golden(seed, smooth):
    probs = _make_probs(seed, smooth=smooth)
    ours = eventize.extract_events(probs)
    golden = golden_extract_events(probs)
    assert ours == golden


def test_extract_events_trailing_note_closed():
    probs = np.zeros((20, 3), np.float32)
    probs[10:, 1] = 0.9  # active until the end
    events = eventize.extract_events(probs)
    assert events == [(10, 1, 10, 7)]


def test_extract_events_real_velocity_flag():
    probs = np.zeros((30, 2), np.float32)
    probs[5:15, 0] = 0.62
    probs[5, 0] = 0.93  # peak at the attack
    default = eventize.extract_events(probs)
    assert default == [(5, 0, 10, 7)]  # reference: velocity fixed at 7
    real = eventize.extract_events(probs, real_velocity=True)
    assert real == [(5, 0, 10, 9)]  # round(0.93 * 10)


def test_extract_events_simple_release():
    probs = np.zeros((30, 2), np.float32)
    probs[5:15, 0] = 0.8
    events = eventize.extract_events(probs)
    assert events == [(5, 0, 10, 7)]


@pytest.mark.parametrize("overlap,dpf", [(0.5, 0.02), (0.25, 0.02), (1.0, 0.03)])
def test_stitch_matches_golden(overlap, dpf):
    rng = np.random.default_rng(42)
    all_probs = rng.random((4, 250, 8)).astype(np.float32)
    ours = np.asarray(stitch.stitch_probs(all_probs, overlap, dpf))
    golden = golden_stitch_probs(all_probs, overlap, dpf)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


def test_stitch_zero_overlap_is_concat():
    rng = np.random.default_rng(0)
    all_probs = rng.random((3, 10, 4)).astype(np.float32)
    out = np.asarray(stitch.stitch_probs(all_probs, 0.0, 0.02))
    np.testing.assert_allclose(out, all_probs.reshape(30, 4))


@pytest.mark.parametrize(
    "w,fpw,overlap,dpf",
    [
        (4, 250, 0.5, 0.02),     # integer ov (25)
        (7, 250, 0.25, 0.02),    # ov 12.5 -> base drift, extrapolated edge row
        (5, 100, 1.0, 0.03),     # ov 33.33
        (1, 50, 0.5, 0.02),      # single window
        (3, 20, 0.0, 0.02),      # no overlap
        (128, 250, 0.5, 0.02),   # bench/serving scale
        (4, 250, 3.0, 0.02),     # ov 150 > half window: pairwise assumption
                                 # breaks, parallel must fall back to the scan
        (6, 100, 1.52, 0.03),    # ov 50.67, d 50 == ceil(ov)-1 boundary
    ],
)
def test_stitch_parallel_matches_scan(w, fpw, overlap, dpf):
    """stitch_probs_parallel (scan-free) is bit-compatible with the scan
    formulation across integer/non-integer overlaps and base drift."""
    rng = np.random.default_rng(7)
    all_probs = rng.random((w, fpw, 6)).astype(np.float32)
    a = np.asarray(stitch.stitch_probs(all_probs, overlap, dpf))
    b = np.asarray(stitch.stitch_probs_parallel(all_probs, overlap, dpf))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_rasterize_dense_matches_numpy_port(seed):
    probs = _make_probs(seed)
    dense = eventize.extract_events_dense(probs)
    ours = np.asarray(rasterize.rasterize_dense(*dense))
    events = eventize.extract_events(probs)
    golden = rasterize.rasterize_events_np(
        events, probs.shape[0], 0, probs.shape[0], num_keys=probs.shape[1]
    )
    # exp() differs in the last f32 ulps between backends; semantics identical.
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_rasterize_np_separator_and_decay():
    # attack at 5 lasting 10 frames; separator zeroes frame 4; decay curve.
    events = [(5, 2, 10, 7)]
    out = rasterize.rasterize_events_np(events, 20, num_keys=4)
    assert out[4, 2] == 0.0
    np.testing.assert_allclose(out[5, 2], 1.0)
    np.testing.assert_allclose(out[6, 2], np.exp(-0.05))
    np.testing.assert_allclose(out[14, 2], max(np.exp(-0.05 * 9), 0.6))
    assert out[15, 2] == 0.0
    # clipped by backing frames
    out2 = rasterize.rasterize_events_np(events, 20, 0, backing_frames=8, num_keys=4)
    assert out2[7, 2] > 0 and out2[8, 2] == 0.0


def test_eventizer_property_fuzz_four_way():
    """Property fuzz of the hardest parity component (common.rs:47-144):
    50 random piano-roll-like rasters plus adversarial patterns sitting
    EXACTLY on the state-machine thresholds (0.5/0.1/0.4 and the /6 edge
    means) must eventize identically through the python golden, the jax
    dense scan, the jax compact path, and the C++ twin."""
    from audio_to_midi_tpu import native
    from audio_to_midi_tpu.ops import eventize

    def all_ways(probs):
        want = golden_extract_events(probs)
        got_dense = eventize.extract_events(jnp.asarray(probs))
        assert got_dense == want
        if native.available():
            assert native.extract_events(probs) == want

    rng = np.random.default_rng(123)
    for i in range(50):
        probs = _make_probs(int(rng.integers(0, 2**31)), smooth=bool(i % 2))
        all_ways(probs)

    f, k = 40, 4
    thr = np.float32
    adversarial = []
    # exact threshold values everywhere (> vs >= boundaries)
    for v in (0.5, 0.1, 0.4, 0.5 + 1e-7, 0.1 - 1e-7):
        adversarial.append(np.full((f, k), v, np.float32))
    # square-wave on/off at varying periods (exercises re-activation gap)
    for period in (2, 5, 6, 7, 12):
        p = np.zeros((f, k), np.float32)
        for start in range(0, f, 2 * period):
            p[start : start + period] = 0.9
        adversarial.append(p)
    # rising/falling ramps crossing all thresholds (peak-deferral rule)
    ramp = np.linspace(0, 1, f, dtype=np.float32)[:, None].repeat(k, 1)
    adversarial += [ramp, ramp[::-1].copy(), np.abs(np.sin(
        np.linspace(0, 12, f, dtype=np.float32)))[:, None].repeat(k, 1)]
    for probs in adversarial:
        all_ways(probs)
