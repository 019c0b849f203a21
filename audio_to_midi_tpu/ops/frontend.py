"""On-device audio frontend: loudness normalization, window slicing, resample.

Replaces the reference's host-side Rust/FFmpeg post-processing:
  * variance normalization with silence guard (python.rs:236-264);
  * slicing arbitrary-length audio into overlapping model windows
    (audio_to_midi_dataset.py:277-294);
  * non-overlapping 5 s training splits with the <50%-backing drop rule
    (python.rs:494-522) — mask-based here, shapes stay static;
  * polyphase resampling to 16 kHz (FFmpeg's -ar in the reference).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def normalize_loudness(samples: jax.Array) -> jax.Array:
    """Unit-variance normalization over both channels with silence guard.

    samples: (2, N).  Matches python.rs:236-264: if max |s| <= 0.05 the audio
    is left untouched (silence/noise guard); otherwise scaled by
    sqrt(1 / mean(s^2)) computed over both channels jointly.
    """
    x = samples.astype(jnp.float32)
    peak = jnp.max(jnp.abs(x))
    variance = jnp.mean(jnp.square(x))
    adjustment = jnp.where(peak <= 0.05, 1.0, jax.lax.rsqrt(variance))
    return (x * adjustment).astype(samples.dtype)


def slice_full_audio(
    samples: jax.Array,
    sample_rate: int,
    window_duration: float,
    overlap: float,
) -> tuple[jax.Array, float]:
    """Split (2, N) audio into overlapping (W, 2, window) model windows.

    Mirrors AudioToMidiDatasetLoader.load_and_slice_full_audio
    (audio_to_midi_dataset.py:277-294): overlap given in seconds, last window
    zero-padded to exact size.
    """
    window_size = round(window_duration * sample_rate)
    overlap_samples = round(overlap * sample_rate)
    step = window_size - overlap_samples
    n = samples.shape[1]
    n_windows = max(1, math.ceil((n - overlap_samples) / step))

    pad_to = (n_windows - 1) * step + window_size
    padded = jnp.pad(samples, ((0, 0), (0, max(0, pad_to - n))))

    starts = np.arange(n_windows) * step
    windows = jnp.stack(
        [jax.lax.dynamic_slice(padded, (0, int(s)), (2, window_size)) for s in starts]
    )
    return windows, window_duration


def split_training_windows(
    samples: np.ndarray, window_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Non-overlapping training splits with the reference's drop rule.

    samples: (2, N) ->
      windows: (S, 2, window_size) zero-padded,
      keep:    (S,) bool — True iff the split has MORE than half real samples
               (python.rs:517),
      backing: (S,) int — number of real (non-pad) samples per split.
    """
    n = samples.shape[1]
    num_splits = max(1, math.ceil(n / window_size))
    out = np.zeros((num_splits, 2, window_size), samples.dtype)
    backing = np.zeros((num_splits,), np.int64)
    for s in range(num_splits):
        start = s * window_size
        take = min(window_size, n - start)
        out[s, :, :take] = samples[:, start : start + take]
        backing[s] = take
    keep = backing > window_size // 2
    return out, keep, backing


def make_windows(
    samples: jax.Array, window_size: int, overlap_samples: int
) -> jax.Array:
    """Static-shape window extraction for jit pipelines.

    samples: (2, N) -> (W, 2, window_size) where W is derived from the static
    N.  Same geometry as :func:`slice_full_audio` but expressed as one gather
    so it fuses into a larger program.
    """
    step = window_size - overlap_samples
    n = samples.shape[1]
    n_windows = max(1, math.ceil((n - overlap_samples) / step))
    pad_to = (n_windows - 1) * step + window_size
    padded = jnp.pad(samples, ((0, 0), (0, max(0, pad_to - n))))
    starts = jnp.arange(n_windows) * step
    idx = starts[:, None] + jnp.arange(window_size)[None, :]  # (W, win)
    return jnp.transpose(padded[:, idx], (1, 0, 2))  # (W, 2, win)


@partial(
    jax.jit,
    static_argnames=("src_rate", "dst_rate", "window_size", "overlap_samples"),
)
def prepare_windows(
    samples: jax.Array,
    src_rate: int,
    dst_rate: int,
    window_size: int,
    overlap_samples: int,
) -> jax.Array:
    """Fused audio frontend: polyphase resample -> loudness normalization ->
    overlapping model windows, one XLA program.  Replaces the reference's
    host-side FFmpeg resample + Rust normalize + python windowing for audio
    that is already in memory.  (2, N) -> (W, 2, window_size)."""
    x = samples.astype(jnp.float32)
    if src_rate != dst_rate:
        x = resample_poly(x, dst_rate, src_rate)
    x = normalize_loudness(x)
    return make_windows(x, window_size, overlap_samples)


# ---------------------------------------------------------------------------
# Legacy spectrogram frontend (reference audio_to_midi_dataset.py:58-107).
# The model consumes raw audio; this exists for tooling/visualization parity.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("window_size", "overlap"))
def fft_audio(signal: jax.Array, window_size: int, overlap: float = 0.5) -> jax.Array:
    """Spectrogram with the reference's exponential-decay window and manual
    complex-abs (kept for coremltools compat) and /180 scaling."""
    if window_size & (window_size - 1):
        raise ValueError("window_size must be a power of 2")
    hop = int(window_size * (1 - overlap))
    sig = signal.reshape(1, -1, 1)
    window = jnp.exp(jnp.arange(window_size) * (-0.001))
    patches = jax.lax.conv_general_dilated_patches(
        lhs=sig,
        filter_shape=(window_size,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    windows = patches.squeeze(0) * window
    fft = jax.vmap(jnp.fft.rfft)(windows)
    absolute = jnp.sqrt(jnp.square(jnp.real(fft)) + jnp.square(jnp.imag(fft)))
    return jnp.transpose(absolute) / 180.0


# ---------------------------------------------------------------------------
# Polyphase resampling (FFmpeg -ar equivalent, on device)
# ---------------------------------------------------------------------------


def _kaiser_sinc_filter(num_taps: int, cutoff: float, beta: float = 8.0) -> np.ndarray:
    """Windowed-sinc low-pass prototype (host-precomputed, static)."""
    n = np.arange(num_taps) - (num_taps - 1) / 2
    h = np.sinc(2 * cutoff * n) * 2 * cutoff
    h *= np.kaiser(num_taps, beta)
    return (h / h.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("up", "down", "taps_per_phase"))
def resample_poly(x: jax.Array, up: int, down: int, taps_per_phase: int = 16) -> jax.Array:
    """Rational-rate polyphase resampler.

    x: (..., N) -> (..., ceil(N * up / down)).  The anti-alias cutoff is
    0.5/max(up, down) of the upsampled rate.  Implemented as a strided conv
    per phase — MXU/VPU friendly, no host DSP library needed.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return x

    num_taps = taps_per_phase * up
    h = _kaiser_sinc_filter(num_taps, 0.5 / max(up, down)) * up  # gain for zero-stuffing

    *lead, n = x.shape
    xf = x.reshape(-1, n).astype(jnp.float32)

    # Upsampled signal length n*up; output index m taps upsampled position
    # m*down.  Polyphase: out[m] = sum_k h[k] * x_up[m*down - k + (num_taps-1)//2...]
    # The zero-stuffing is implicit: lhs_dilation=(up,) makes the conv read
    # the upsampled grid without materializing the (N*up) stuffed signal —
    # explicit stuffing costs up x the input in HBM (a 3-minute 44.1 kHz
    # file at up=160 would build a ~10 GB intermediate).  Edge padding
    # reproduces the stuffed layout exactly: lo = half-filter, hi adds the
    # (up-1) trailing zeros stuffing appends after the last sample.
    pad = num_taps // 2
    out_len = int(math.ceil(n * up / down))
    y = jax.lax.conv_general_dilated(
        xf[:, None, :],
        jnp.asarray(h)[None, None, ::-1],
        window_strides=(down,),
        padding=[(pad, pad + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )[:, 0, :out_len]
    return y.reshape(*lead, -1).astype(x.dtype)
