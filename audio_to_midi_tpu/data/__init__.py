from . import audio_io, augment, labels, loader, synthetic
from .loader import (
    AudioToMidiDatasetLoader,
    ThreadedBatchLoader,
    create_dataset_loader,
    load_and_slice_full_audio,
    load_events_and_audio,
    load_events_and_audio_with_transformations,
    load_full_audio,
    load_sample_names,
    load_samples,
)

__all__ = [
    "audio_io",
    "augment",
    "labels",
    "loader",
    "synthetic",
    "AudioToMidiDatasetLoader",
    "ThreadedBatchLoader",
    "create_dataset_loader",
    "load_and_slice_full_audio",
    "load_events_and_audio",
    "load_events_and_audio_with_transformations",
    "load_full_audio",
    "load_sample_names",
    "load_samples",
]
