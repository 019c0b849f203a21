"""Crossfade stitching of overlapping inference windows — on-device.

Reference semantics (rust common.rs:13-45): windows are laid out every
``frames_per_window - overlapping_frames`` output frames (float accumulation,
truncated per window); within the first ``ceil(overlapping_frames)`` frames of
every window after the first, the value is linearly cross-faded with whatever
the previous window wrote (``blend = frame / overlapping_frames``); all other
frames are overwritten by the latest window.

The sequential write-then-blend loop is reproduced exactly as a
``lax.scan`` over windows with dynamic-slice read/modify/write — identical
arithmetic, one compiled program, no host round-trip.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def stitch_plan(
    num_windows: int, frames_per_window: int, overlap: float, duration_per_frame: float
) -> tuple[np.ndarray, int, float]:
    """Static geometry: per-window output base index, total frames, overlap."""
    overlapping_frames = float(overlap) / float(duration_per_frame)
    output_frames = int(
        num_windows * frames_per_window - int(overlapping_frames) * (num_windows - 1)
    )
    bases = np.zeros((num_windows,), np.int64)
    base = 0.0
    for w in range(num_windows):
        bases[w] = int(base)
        base += frames_per_window - overlapping_frames
    return bases, output_frames, overlapping_frames


@partial(jax.jit, static_argnames=("overlap", "duration_per_frame"))
def stitch_probs(
    all_probs: jax.Array, overlap: float, duration_per_frame: float
) -> jax.Array:
    """(num_windows, frames_per_window, E) -> (output_frames, E) float32."""
    num_windows, fpw, e = all_probs.shape
    bases, output_frames, ov = stitch_plan(num_windows, fpw, overlap, duration_per_frame)

    probs = all_probs.astype(jnp.float32)
    out = jnp.zeros((output_frames + fpw, e), jnp.float32)  # slack for safe slices

    if ov > 0:
        frame_idx = jnp.arange(fpw, dtype=jnp.float32)
        blend = (frame_idx / ov)[:, None]
        in_blend_region = (frame_idx <= math.ceil(ov))[:, None]
    else:
        blend = jnp.zeros((fpw, 1), jnp.float32)
        in_blend_region = jnp.zeros((fpw, 1), bool)

    def body(out, wb):
        window_probs, base, is_first = wb
        cur = jax.lax.dynamic_slice(out, (base, 0), (fpw, e))
        blended = jnp.where(
            in_blend_region & jnp.logical_not(is_first),
            (1.0 - blend) * cur + blend * window_probs,
            window_probs,
        )
        out = jax.lax.dynamic_update_slice(out, blended, (base, 0))
        return out, None

    is_first = jnp.arange(num_windows) == 0
    out, _ = jax.lax.scan(body, out, (probs, jnp.asarray(bases), is_first), unroll=4)
    return out[:output_frames]
