"""Synthetic piano-ish dataset generation (tests + benchmarks).

The reference has no test assets; we synthesize decaying-harmonic "piano"
notes from known MIDI events, write WAV + CSV pairs in the reference dataset
layout, and use them for end-to-end tests (known notes -> transcription) and
benchmarking without shipping audio.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import SAMPLE_RATE
from .audio_io import write_wav
from .labels import write_events_csv


def midi_key_frequency(key: int) -> float:
    return 440.0 * 2.0 ** ((key - 69) / 12.0)


def synth_note(
    key: int,
    duration_s: float,
    sample_rate: int = SAMPLE_RATE,
    velocity: float = 0.7,
    decay: float = 3.0,
    harmonics: tuple[tuple[int, float], ...] = (
        (1, 1.0), (2, 0.5), (3, 0.25), (4, 0.125)
    ),
) -> np.ndarray:
    """Decaying harmonic stack with a sharp attack — crude piano.

    ``decay``/``harmonics`` vary the timbre (generalization experiments);
    the defaults are the original fixed voice."""
    n = int(duration_s * sample_rate)
    t = np.arange(n, dtype=np.float32) / sample_rate
    f0 = midi_key_frequency(key)
    x = np.zeros(n, np.float32)
    for h, amp in harmonics:
        f = f0 * h
        if f < sample_rate / 2:
            x += amp * np.sin(2 * np.pi * f * t, dtype=np.float32)
    env = np.exp(-decay * t) * (1 - np.exp(-200.0 * t))
    return (velocity * x * env).astype(np.float32)


def synth_performance(
    events: list[tuple[float, float, int, float]],
    total_s: float,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 0,
    stereo_spread: float = 0.2,
    decay: float = 3.0,
    harmonics: tuple[tuple[int, float], ...] = (
        (1, 1.0), (2, 0.5), (3, 0.25), (4, 0.125)
    ),
) -> np.ndarray:
    """events: (onset_s, duration_s, midi_key, velocity 0..1) -> (2, N)."""
    rng = np.random.default_rng(seed)
    n = int(total_s * sample_rate)
    left = np.zeros(n, np.float32)
    right = np.zeros(n, np.float32)
    for onset, dur, key, vel in events:
        note = synth_note(key, dur, sample_rate, vel, decay=decay, harmonics=harmonics)
        start = int(onset * sample_rate)
        stop = min(n, start + note.shape[0])
        if stop <= start:
            continue
        pan = 0.5 + stereo_spread * (rng.random() - 0.5)
        left[start:stop] += note[: stop - start] * (1 - pan)
        right[start:stop] += note[: stop - start] * pan
    peak = max(np.max(np.abs(left)), np.max(np.abs(right)), 1e-6)
    scale = 0.8 / peak
    return np.stack([left * scale, right * scale])


def random_events(
    total_s: float, num_notes: int, seed: int = 0, chord_prob: float = 0.0
) -> list[tuple[float, float, int, float]]:
    """Random note events; ``chord_prob`` adds a consonant companion note at
    the same onset with probability per note (harder polyphonic data)."""
    rng = np.random.default_rng(seed)
    events = []
    for _ in range(num_notes):
        onset = float(rng.uniform(0.0, max(total_s - 0.5, 0.1)))
        dur = float(rng.uniform(0.2, 1.5))
        key = int(rng.integers(36, 96))  # C2..C7
        vel = float(rng.uniform(0.4, 1.0))
        events.append((onset, min(dur, total_s - onset), key, vel))
        if chord_prob > 0 and rng.random() < chord_prob:
            interval = int(rng.choice([3, 4, 5, 7, 12]))
            key2 = min(key + interval, 95)
            events.append((onset, min(dur, total_s - onset), key2, vel * 0.9))
    events.sort()
    return events


def make_synthetic_dataset(
    out_dir: str | Path,
    num_samples: int = 4,
    duration_s: float = 6.0,
    notes_per_sample: int = 12,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 0,
    variety: bool = False,
) -> list[str]:
    """Write <name>.wav + <name>.csv pairs in the reference dataset layout.

    ``variety=True`` randomizes timbre per sample (decay, harmonic rolloff)
    and adds chords — the generalization-experiment mode; False keeps the
    original fixed voice (test fixtures)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(num_samples):
        name = f"sample_{i:03d}"
        s = seed * 1000 + i
        if variety:
            rng = np.random.default_rng(s + 7_777_777)
            decay = float(rng.uniform(1.5, 5.0))
            rolloff = float(rng.uniform(0.3, 0.7))
            harmonics = tuple(
                (h, rolloff ** (h - 1)) for h in range(1, 6)
            )
            chord_prob = float(rng.uniform(0.1, 0.5))
        else:
            decay, harmonics, chord_prob = (
                3.0, ((1, 1.0), (2, 0.5), (3, 0.25), (4, 0.125)), 0.0
            )
        events = random_events(
            duration_s, notes_per_sample, seed=s, chord_prob=chord_prob
        )
        audio = synth_performance(
            events, duration_s, sample_rate, seed=s,
            decay=decay, harmonics=harmonics,
        )
        write_wav(out_dir / f"{name}.wav", audio, sample_rate)
        write_events_csv(out_dir / f"{name}.csv", events)
        names.append(name)
    return names
