"""Sequential numpy ports of the reference Rust data-plane semantics.

These are straight, loop-for-loop translations of rust-plugins/src/common.rs
(stitcher common.rs:13-45, eventizer common.rs:47-144) used as golden oracles
for the vectorized on-device implementations.  Deliberately slow and obvious.
"""

import math

import numpy as np


def golden_stitch_probs(all_probs, overlap: float, duration_per_frame: float):
    num_windows, fpw, e = all_probs.shape
    ov = float(overlap) / float(duration_per_frame)
    output_frames = int(num_windows * fpw - int(ov) * (num_windows - 1))
    stitched = np.zeros((output_frames, e), np.float32)
    base = 0.0
    for w in range(num_windows):
        for f in range(fpw):
            idx = int(base) + f
            if w > 0 and f <= math.ceil(ov):
                blend = f / ov
                stitched[idx] = (
                    (1.0 - blend) * stitched[idx].astype(np.float64)
                    + blend * all_probs[w, f].astype(np.float64)
                ).astype(np.float32)
            else:
                stitched[idx] = all_probs[w, f]
        base += fpw - ov
    return stitched


def golden_extract_events(probs):
    """Port of common.rs:47-144 (velocity fixed to 7, as the reference)."""
    reactivation_gap = 0.1
    reactivation_threshold = 0.4
    activation_threshold = 0.5
    deactivation_threshold = 0.1

    num_frames, num_notes = probs.shape
    probs = probs.astype(np.float32)
    events = []
    currently_playing = [None] * num_notes

    def duration(end, start):
        return max(end - start, 1)

    for frame in range(num_frames):
        for key in range(num_notes):
            if currently_playing[key] is not None:
                started_at = currently_playing[key]
                if probs[frame, key] < deactivation_threshold:
                    events.append((started_at, key, duration(frame, started_at), 7))
                    currently_playing[key] = None
                else:
                    time_since = float(frame) - float(started_at)
                    should_reactivate = False
                    if time_since > 5.0:
                        samples = 6
                        prev_average = np.float32(0.0)
                        for i in range(frame - samples, frame):
                            prev_average += probs[i, key]
                        prev_average /= samples
                        next_average = np.float32(0.0)
                        for i in range(frame, min(frame + samples, num_frames)):
                            next_average += probs[i, key]
                        next_average /= samples
                        should_reactivate = next_average - prev_average > reactivation_gap

                    if frame < num_frames - 1 and probs[frame, key] < probs[frame + 1, key]:
                        continue

                    if probs[frame, key] > reactivation_threshold and should_reactivate:
                        events.append(
                            (started_at, key, duration(frame - 1, started_at), 7)
                        )
                        currently_playing[key] = frame
            else:
                if probs[frame, key] > activation_threshold:
                    currently_playing[key] = frame

    for key in range(num_notes):
        if currently_playing[key] is not None:
            started_at = currently_playing[key]
            events.append((started_at, key, duration(num_frames, started_at), 7))
            currently_playing[key] = None

    events.sort()
    return events
