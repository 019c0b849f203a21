"""Reference-compat surfaces: the modelutil module and the
AudioToMidiDatasetLoader class behave like the reference plugin/loader."""

import numpy as np
import pytest

from audio_to_midi_tpu import modelutil
from audio_to_midi_tpu.config import MODEL_AUDIO_LENGTH, SAMPLE_RATE
from audio_to_midi_tpu.data import synthetic
from audio_to_midi_tpu.data.loader import AudioToMidiDatasetLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("compat_dataset")
    names = synthetic.make_synthetic_dataset(d, num_samples=2, duration_s=6.0, seed=21)
    return d, names


def test_modelutil_load_full_audio(dataset):
    d, names = dataset
    from audio_to_midi_tpu.data.loader import resolve_audio_file

    f = resolve_audio_file(d / names[0])
    audio = modelutil.load_full_audio(str(f), SAMPLE_RATE)
    assert audio.shape[0] == 2
    assert audio.dtype == np.float32


def test_modelutil_load_events_and_audio(dataset):
    d, names = dataset
    audio, events, out_names = modelutil.load_events_and_audio(
        str(d), names, SAMPLE_RATE, MODEL_AUDIO_LENGTH, 250
    )
    assert len(audio) == len(events) == len(out_names) == 2
    assert audio[0].shape == (2, 80000)
    assert events[0].shape == (250, 90)
    assert out_names[0].endswith("+0")


def test_modelutil_transformations(dataset):
    d, names = dataset
    settings = modelutil.DatasetTransfromSettings(
        pan_probability=0.8, channel_switch_probability=0.5, cut_probability=0.4,
        rotate_probability=0.9, random_erasing_probability=0.3,
        mixup_probability=0.6, gain_probability=0.8, noise_probability=0.8,
        label_smoothing_alpha=0.005,
    )
    audio, events, _ = modelutil.load_events_and_audio_with_transformations(
        str(d), names, SAMPLE_RATE, MODEL_AUDIO_LENGTH, 250, settings
    )
    assert events[0].min() >= 0.005 - 1e-6


def test_modelutil_stitch_extract_to_frame():
    rng = np.random.default_rng(0)
    probs = rng.random((3, 50, 90)).astype(np.float32) * 0.3
    probs[0, 10:30, 40] = 0.9
    stitched = modelutil.stitch_probs(probs, 0.2, 0.02)
    assert stitched.shape[1] == 90
    events = modelutil.extract_events(stitched)
    assert any(e[1] == 40 for e in events)
    frames = modelutil.to_frame_events([events], stitched.shape[0])
    assert frames[0].shape == (stitched.shape[0], 90)


def test_dataset_loader_class(dataset):
    d, names = dataset
    assert AudioToMidiDatasetLoader.SAMPLE_RATE == 16000
    assert AudioToMidiDatasetLoader.load_sample_names(d) == sorted(names)
    midi_events, audio, out_names = AudioToMidiDatasetLoader.load_samples(
        d, 250, [names[0]], SAMPLE_RATE, MODEL_AUDIO_LENGTH
    )
    assert audio.shape[1:] == (2, 80000)
    assert midi_events.shape[1:] == (250, 90)

    from audio_to_midi_tpu.data.loader import resolve_audio_file

    windows, dur = AudioToMidiDatasetLoader.load_and_slice_full_audio(
        resolve_audio_file(d / names[0]), overlap=0.5
    )
    assert dur == MODEL_AUDIO_LENGTH

    with AudioToMidiDatasetLoader(
        num_model_output_frames=250, dataset_dir=d, batch_size=2,
        prefetch_count=2, epochs=3,
    ) as ldr:
        batch = next(iter(ldr))
    assert batch["audio"].shape == (2, 2, 80000)
    assert batch["events"].shape == (2, 250, 90)
