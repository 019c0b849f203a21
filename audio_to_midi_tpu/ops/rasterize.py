"""Event-list -> dense frame-label rasterization.

Reference semantics (rust python.rs:423-447 ``convert_to_frame_events``): a
zeroed (num_frames, 90) buffer; events processed in sorted order, each
  1. zeroes the frame just before its (shifted) attack when that attack is in
     (0, num_frames) — the fast-re-activation separator;
  2. writes ``decay(t) = max(exp(-0.05 t), 0.6)`` over
     [max(0, start), min(end, num_frames, backing_frames)).

Two implementations:
  * :func:`rasterize_events_np` — faithful sequential numpy port (host label
    prep + golden reference for tests).
  * :func:`rasterize_dense` — on-device jit version consuming the dense
    eventizer output of :mod:`audio_to_midi_tpu.ops.eventize`.  For eventizer
    output, per-key spans are chronological and non-overlapping, so the
    sequential overwrite semantics reduce to: a frame is zero if some event
    attacks at t+1; otherwise it takes the decay of the covering span (the
    latest attack <= t).  That reduction is exact for eventizer output and is
    tested against the numpy port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MIDI_EVENT_VOCAB_SIZE


def _decay_np(t: np.ndarray) -> np.ndarray:
    return np.maximum(np.exp(-0.05 * t), 0.6)


def rasterize_events_np(
    events,
    num_frames: int,
    start_frame: int = 0,
    backing_frames: int | None = None,
    num_keys: int = MIDI_EVENT_VOCAB_SIZE,
) -> np.ndarray:
    """Sequential port of reference python.rs:423-447.  float32 output."""
    if backing_frames is None:
        backing_frames = num_frames
    frames = np.zeros((num_frames, num_keys), np.float32)
    for attack, key, duration, _velocity in events:
        if not 0 <= key < num_keys:  # same guard as the C++ twin: a
            continue                 # malformed CSV key must not index
        fs = int(attack) - start_frame
        fe = fs + int(duration)
        if 0 < fs < num_frames:
            frames[fs - 1, key] = 0.0
        lo = max(fs, 0)
        hi = min(fe, num_frames, backing_frames)
        if hi > lo:
            t = np.arange(lo, hi, dtype=np.float32) - fs
            frames[lo:hi, key] = _decay_np(t)
    return frames


@jax.jit
def rasterize_dense(
    fired: jax.Array,
    attack: jax.Array,
    duration: jax.Array,
    final_active: jax.Array,
    final_attack: jax.Array,
) -> jax.Array:
    """On-device rasterization of dense eventizer output.

    All args as returned by ``extract_events_dense``; output (N, K) float32
    equal to ``rasterize_events_np(extract_events(probs), N)``.
    """
    num_frames, num_keys = fired.shape

    # Scatter events to their attack positions: attacked[a, k] = True and
    # ends[a, k] = a + duration.  Out-of-bounds rows (non-fired) are dropped.
    rows = jnp.where(fired, attack, num_frames)
    cols = jnp.broadcast_to(jnp.arange(num_keys), fired.shape)
    attacked = jnp.zeros((num_frames, num_keys), bool).at[rows, cols].set(
        True, mode="drop"
    )
    ends = jnp.zeros((num_frames, num_keys), jnp.int32).at[rows, cols].set(
        attack + duration, mode="drop"
    )

    # Trailing still-active notes (closed with duration N - start, min 1).
    k = jnp.arange(num_keys)
    tail_rows = jnp.where(final_active, final_attack, num_frames)
    tail_end = jnp.maximum(num_frames - final_attack, 1) + final_attack
    attacked = attacked.at[tail_rows, k].set(True, mode="drop")
    ends = ends.at[tail_rows, k].max(
        jnp.where(final_active, tail_end, 0), mode="drop"
    )

    # Sweep: carry the covering span per key.
    def step(carry, xs):
        cur_attack, cur_end = carry
        attacked_f, ends_f, frame = xs
        cur_attack = jnp.where(attacked_f, frame, cur_attack)
        cur_end = jnp.where(attacked_f, ends_f, cur_end)
        t = (frame - cur_attack).astype(jnp.float32)
        val = jnp.where(
            frame < cur_end, jnp.maximum(jnp.exp(-0.05 * t), 0.6), 0.0
        )
        return (cur_attack, cur_end), val

    init = (
        jnp.full((num_keys,), -1, jnp.int32),
        jnp.zeros((num_keys,), jnp.int32),
    )
    _, values = jax.lax.scan(
        step,
        init,
        (attacked, ends, jnp.arange(num_frames, dtype=jnp.int32)),
    )

    # Fast-re-activation separator: zero frame t when an attack happens at t+1
    # (attack in (0, num_frames)).
    zero_mask = jnp.concatenate(
        [attacked[1:], jnp.zeros((1, num_keys), bool)], axis=0
    )
    return jnp.where(zero_mask, 0.0, values)


def to_frame_events(event_lists, frame_count: int) -> list[np.ndarray]:
    """Reference ``modelutil.to_frame_events`` (python.rs:980-1005)."""
    return [
        rasterize_events_np(events, frame_count, 0, frame_count)
        for events in event_lists
    ]
