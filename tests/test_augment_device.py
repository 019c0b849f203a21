"""On-device augmentation tests."""

import jax
import numpy as np

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
