"""On-device augmentation tests."""

import jax
import numpy as np
import pytest

from audio_to_midi_tpu.config import TransformSettings
from audio_to_midi_tpu.data.augment_device import transform_for_training_device


def test_device_augment_shapes_and_bounds():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((8, 2, 500)).astype(np.float32)
    labels = rng.random((8, 20, 90)).astype(np.float32)
    settings = TransformSettings()
    a2, l2 = transform_for_training_device(
        audio, labels, settings, jax.random.PRNGKey(0)
    )
    a2, l2 = np.asarray(a2), np.asarray(l2)
    assert a2.shape == audio.shape and l2.shape == labels.shape
    assert not np.array_equal(a2, audio)
    assert l2.min() >= settings.label_smoothing_alpha - 1e-6
    assert l2.max() <= 1 - settings.label_smoothing_alpha + 1e-6
    # Deterministic per key
    a3, l3 = transform_for_training_device(
        audio, labels, settings, jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(a2, np.asarray(a3))


def test_device_augment_identity_when_disabled():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((4, 2, 100)).astype(np.float32)
    labels = rng.random((4, 10, 90)).astype(np.float32)
    off = TransformSettings(
        pan_probability=0.0, channel_switch_probability=0.0, cut_probability=0.0,
        rotate_probability=0.0, random_erasing_probability=0.0, mixup_probability=0.0,
        gain_probability=0.0, noise_probability=0.0, label_smoothing_alpha=0.0,
    )
    a2, l2 = transform_for_training_device(audio, labels, off, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a2), audio)
    np.testing.assert_array_equal(np.asarray(l2), labels)


def test_device_rotate_preserves_content():
    """Rotation only: multiset of samples per item is preserved."""
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((4, 2, 64)).astype(np.float32)
    labels = rng.random((4, 8, 90)).astype(np.float32)
    only_rot = TransformSettings(
        pan_probability=0.0, channel_switch_probability=0.0, cut_probability=0.0,
        rotate_probability=1.0, random_erasing_probability=0.0, mixup_probability=0.0,
        gain_probability=0.0, noise_probability=0.0, label_smoothing_alpha=0.0,
    )
    a2, _ = transform_for_training_device(audio, labels, only_rot, jax.random.PRNGKey(3))
    a2 = np.asarray(a2)
    for i in range(4):
        np.testing.assert_allclose(
            np.sort(a2[i].ravel()), np.sort(audio[i].ravel()), rtol=1e-6
        )


def _only_timbre(**kw):
    return TransformSettings(
        pan_probability=0.0, channel_switch_probability=0.0, cut_probability=0.0,
        rotate_probability=0.0, random_erasing_probability=0.0, mixup_probability=0.0,
        gain_probability=0.0, noise_probability=0.0, label_smoothing_alpha=0.0,
        **kw,
    )


def test_timbre_augment_off_by_default():
    """The three timbre extensions default to probability 0 — reference
    parity of the augmentation distribution is unchanged by default."""
    s = TransformSettings()
    assert s.eq_probability == 0.0
    assert s.dynamics_warp_probability == 0.0
    assert s.am_jitter_probability == 0.0


def test_timbre_augment_perturbs_audio_not_labels():
    rng = np.random.default_rng(5)
    audio = rng.standard_normal((8, 2, 4096)).astype(np.float32)
    labels = rng.random((8, 16, 90)).astype(np.float32)
    s = _only_timbre(
        eq_probability=1.0, dynamics_warp_probability=1.0,
        am_jitter_probability=1.0,
    )
    a2, l2 = transform_for_training_device(audio, labels, s, jax.random.PRNGKey(0))
    a2, l2 = np.asarray(a2), np.asarray(l2)
    np.testing.assert_array_equal(l2, labels)  # label-preserving
    assert np.isfinite(a2).all()
    assert not np.array_equal(a2, audio)
    # amplitude-shaping transforms stay bounded: no order-of-magnitude blowup
    assert np.abs(a2).max() < np.abs(audio).max() * 8

    # deterministic under the same key, different under another
    a3, _ = transform_for_training_device(audio, labels, s, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a3), a2)
    a4, _ = transform_for_training_device(audio, labels, s, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(a4), a2)


def test_eq_reshapes_spectrum_smoothly():
    """The random-cepstrum EQ changes the spectral envelope but neither
    notches it to zero nor moves energy to new frequencies (a pure tone in
    stays a pure tone out, rescaled)."""
    n = 4096
    t = np.arange(n) / 16000.0
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    audio = np.stack([tone, tone])[None].repeat(2, axis=0)  # (2, 2, n)
    labels = np.zeros((2, 8, 90), np.float32)
    s = _only_timbre(eq_probability=1.0, eq_strength=0.5)
    a2, _ = transform_for_training_device(audio, labels, s, jax.random.PRNGKey(7))
    a2 = np.asarray(a2)
    for i in range(2):
        spec_in = np.abs(np.fft.rfft(audio[i, 0]))
        spec_out = np.abs(np.fft.rfft(a2[i, 0]))
        peak = spec_in.argmax()
        assert spec_out.argmax() == pytest.approx(peak, abs=2)  # no freq shift
        ratio = spec_out[peak] / spec_in[peak]
        assert 0.1 < ratio < 10.0  # gentle tilt, not a notch/blowup


def test_dynamics_warp_changes_crest_factor():
    """gamma != 1 changes the peak/RMS ratio of a decaying note."""
    n = 8192
    t = np.arange(n) / 16000.0
    note = (np.exp(-6 * t) * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    audio = np.stack([note, note])[None].astype(np.float32)
    labels = np.zeros((1, 8, 90), np.float32)
    s = _only_timbre(dynamics_warp_probability=1.0)
    crest_in = np.abs(audio[0, 0]).max() / (np.sqrt(np.mean(audio[0, 0] ** 2)) + 1e-9)
    changed = 0
    for seed in range(6):
        a2, _ = transform_for_training_device(
            audio, labels, s, jax.random.PRNGKey(seed)
        )
        a2 = np.asarray(a2)
        crest_out = np.abs(a2[0, 0]).max() / (
            np.sqrt(np.mean(a2[0, 0] ** 2)) + 1e-9
        )
        if abs(crest_out - crest_in) / crest_in > 0.02:
            changed += 1
    assert changed >= 3  # gamma draws away from 1 actually reshape dynamics
