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


@partial(jax.jit, static_argnames=("overlap", "duration_per_frame"))
def stitch_probs_parallel(
    all_probs: jax.Array, overlap: float, duration_per_frame: float
) -> jax.Array:
    """Scan-free stitcher — identical output to :func:`stitch_probs`.

    The sequential write-then-blend loop is exactly PAIRWISE: window w's
    blend region only ever reads window w-1's final rows (the bases advance
    by ~fpw - ov per window, so no third window is involved), and every
    output row is finally owned by the LAST window that writes it (rows
    [b_w, b_{w+1}) belong to w).  So all blends compute in parallel from a
    shifted gather of the previous window, and assembly is one
    unique-indices scatter — no W-length sequential scan on the hot serving
    path.
    """
    num_windows, fpw, e = all_probs.shape
    bases_np, output_frames, ov = stitch_plan(
        num_windows, fpw, overlap, duration_per_frame
    )
    probs = all_probs.astype(jnp.float32)
    if num_windows == 1:
        return probs[0][:output_frames]
    if ov > 0 and int(np.min(bases_np[1:] - bases_np[:-1])) <= math.ceil(ov):
        # Pairwise-blend precondition violated: when windows advance by no
        # more than the blend width (overlap >= ~half a window), window w's
        # blend reads rows of w-1 that were THEMSELVES blended — only the
        # sequential scan reproduces that chaining.  Geometry is static, so
        # this is a trace-time fallback, not a runtime branch.
        return stitch_probs(all_probs, overlap, duration_per_frame)

    r = jnp.arange(fpw)
    if ov > 0:
        blend = (r.astype(jnp.float32) / ov)[:, None]
        in_blend = (r <= math.ceil(ov))[:, None]
        # Window w (>0) blends row r with window w-1's row (b_w - b_{w-1}) + r;
        # past w-1's last row the scan read the zero slack buffer.
        d = jnp.asarray(bases_np[1:] - bases_np[:-1])  # (W-1,)
        idx = d[:, None] + r[None, :]
        oob = (idx >= fpw)[:, :, None]
        prev = jnp.take_along_axis(
            probs[:-1], jnp.clip(idx, 0, fpw - 1)[:, :, None], axis=1
        )
        cur = jnp.where(oob, 0.0, prev)
        tail = jnp.where(
            in_blend[None], (1.0 - blend) * cur + blend * probs[1:], probs[1:]
        )
        final = jnp.concatenate([probs[:1], tail], axis=0)
    else:
        final = probs

    # Ownership: window w finally owns rows [0, b_{w+1} - b_w); the last
    # window owns all fpw rows.  Owned indices are unique; disowned rows get
    # index output_frames and are dropped.
    next_base = np.concatenate([bases_np[1:], [bases_np[-1] + fpw]])
    own_len = jnp.asarray(next_base - bases_np)  # (W,)
    owned = (r[None, :] < own_len[:, None]).reshape(-1)
    abs_idx = (jnp.asarray(bases_np)[:, None] + r[None, :]).reshape(-1)
    # Disowned rows get DISTINCT out-of-bounds indices (dropped) so
    # unique_indices holds for the scatter's fast path.
    flat_n = num_windows * fpw
    abs_idx = jnp.where(owned, abs_idx, output_frames + jnp.arange(flat_n))
    out = jnp.zeros((output_frames, e), jnp.float32)
    out = out.at[abs_idx].set(
        final.reshape(-1, e), mode="drop", unique_indices=True
    )
    return out


# ---------------------------------------------------------------------------
# Streaming (chunked) stitching — bit-identical to the batch stitchers
# ---------------------------------------------------------------------------


def stitch_chunk_plan(
    num_windows: int, frames_per_window: int, overlap: float, duration_per_frame: float
):
    """Per-window (blend-read offset, owned-rows) tuples for chunked stitching.

    Derived from the same float-accumulated global bases as
    :func:`stitch_plan`, so chunk boundaries never perturb the geometry
    (with non-integral overlap frames the bases are NON-uniform — int()
    truncation of a float accumulator — and must be computed globally)."""
    bases, output_frames, ov = stitch_plan(
        num_windows, frames_per_window, overlap, duration_per_frame
    )
    d = np.concatenate([[0], bases[1:] - bases[:-1]])  # d[0] unused
    next_base = np.concatenate([bases[1:], [bases[-1] + frames_per_window]])
    own = next_base - bases
    if ov > 0 and num_windows > 1 and int(np.min(d[1:])) <= math.ceil(ov):
        raise ValueError(
            "chunked stitching needs the pairwise-blend precondition "
            "(window stride > blend width); use the batch stitcher for "
            f"overlap {overlap} at {duration_per_frame}s/frame"
        )
    return d, own, output_frames, ov


@partial(jax.jit, static_argnames=("d", "own", "ov", "first"))
def stitch_chunk(
    prev_window: jax.Array,
    chunk_probs: jax.Array,
    *,
    d: tuple,
    own: tuple,
    ov: float,
    first: bool,
) -> jax.Array:
    """Stitched output rows OWNED by this chunk's windows — bit-identical to
    the same rows of :func:`stitch_probs_parallel` over the full sequence.

    prev_window: (fpw, E) probs of the window immediately before the chunk
    (ignored when ``first``); chunk_probs: (Wc, fpw, E); ``d``/``own``: this
    chunk's per-window blend-read offsets and owned-row counts from
    :func:`stitch_chunk_plan`.  Every output row depends on at most the two
    adjacent windows (the pairwise precondition), so per-chunk evaluation
    with one context window reproduces the batch output exactly; ownership
    rows are the contiguous prefix [0, own_w) of each blended window, so the
    emitted segment is a plain concatenation.
    """
    probs = chunk_probs.astype(jnp.float32)
    wc, fpw, e = probs.shape
    prevs = jnp.concatenate(
        [prev_window.astype(jnp.float32)[None], probs[:-1]], axis=0
    )
    r = jnp.arange(fpw)
    if ov > 0:
        blend = (r.astype(jnp.float32) / ov)[:, None]
        in_blend = (r <= math.ceil(ov))[:, None]
        idx = jnp.asarray(d)[:, None] + r[None, :]
        oob = (idx >= fpw)[:, :, None]
        prev_rows = jnp.take_along_axis(
            prevs, jnp.clip(idx, 0, fpw - 1)[:, :, None], axis=1
        )
        cur = jnp.where(oob, 0.0, prev_rows)
        final = jnp.where(
            in_blend[None], (1.0 - blend) * cur + blend * probs, probs
        )
        if first:  # window 0 of the whole sequence is never blended
            final = jnp.concatenate([probs[:1], final[1:]], axis=0)
    else:
        final = probs
    return jnp.concatenate([final[i, : own[i]] for i in range(wc)], axis=0)
