"""audio_to_midi_tpu — a TPU-native piano-transcription framework.

From-scratch rebuild of kasper0406/audio-to-midi for TPU: JAX/XLA/Pallas
compute path, explicit SPMD data parallelism over a device mesh, a C++ host
data plane, and on-device DSP (stitching, eventization, metrics).
"""

from .config import (
    Config,
    DataConfig,
    DEFAULT_CONFIG,
    InferConfig,
    MIDI_EVENT_VOCAB_SIZE,
    MODEL_AUDIO_LENGTH,
    ModelConfig,
    NUM_VELOCITY_CATEGORIES,
    PrecisionConfig,
    SAMPLE_RATE,
    TrainConfig,
    TransformSettings,
)

__version__ = "0.1.0"
