"""Inference: checkpoint loading, windowed prediction, crossfade stitching.

Reference surface: infer.py:27-44 (predict_and_stitch), infer.py:172-236
(load_newest_checkpoint).  TPU-native: the window batch runs through the model
as ONE batched jitted call, and the crossfade stitcher runs on device in the
same process — no host/Rust round trip; ``predict_and_stitch_fused`` compiles
model + stitcher into a single XLA program.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, DEFAULT_CONFIG
from .models import model as model_lib
from .models.rope import RopeFreqs
from .ops.stitch import stitch_probs_parallel as stitch_probs
from .parallel.mesh import make_mesh, replicated
from .train import checkpoint as ckpt

log = logging.getLogger(__name__)


def _parity_precision(param_dtype):
    """f32 inference is the checkpoint-parity mode (reference infer.py:27-32
    runs f32).  On TPU, DEFAULT matmul precision executes f32 dots as bf16
    MXU passes — ~4e-3 relative drift vs true f32 (measured: pallas/xla both,
    see tools/tpu_selftest.py) — so imported reference checkpoints would not
    reproduce reference outputs.  Tracing under 'highest' restores true-f32
    matmuls (parity to ~2e-7); bf16 serving (the speed mode) is unaffected.
    JAX keys jit caches on this config, so both modes coexist."""
    import contextlib

    if jnp.dtype(param_dtype) == jnp.float32:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


def load_newest_checkpoint(
    checkpoint_path: str | Path,
    cfg: Config = DEFAULT_CONFIG,
    ensemble_size: int = 1,
    ensemble_select: Optional[int] = 0,
    model_replication: bool = True,
    step: Optional[int] = None,
):
    """Restore the latest checkpoint -> (params, state).

    ``ensemble_select`` picks one member off the population axis (None keeps
    the full ensemble); with ``model_replication`` the params are placed
    replicated on all devices.  Params are cast to f32 (reference
    infer.py:234).
    """
    skeleton, state = model_lib.init_ensemble(
        jax.random.PRNGKey(1234), cfg.model, ensemble_size
    )
    manager = ckpt.create_checkpoint_manager(checkpoint_path, cfg)
    ckpt.check_metadata(manager, cfg)
    restored = ckpt.restore_checkpoint(manager, skeleton, state, step=step)
    if restored is None:
        raise FileNotFoundError(
            f"There is no checkpoint to load in {checkpoint_path}!"
        )
    params, state, restored_step = restored
    log.info("Restored checkpoint at step %d", restored_step)

    if ensemble_select is not None:
        params = jax.tree.map(lambda x: x[ensemble_select], params)

    params = model_lib.cast_params(params, jnp.float32)
    if model_replication:
        params = jax.device_put(params, replicated(make_mesh()))
    return params, state


@partial(jax.jit, static_argnames=("cfg",))
def _predict_windows(params, cfg, windows, rope):
    # Serving pins its own scheduling knobs (config.ModelConfig.for_serving):
    # unroll-1 measured ~2.7% faster than the train-tuned unrolls at the
    # serving-peak batch 128, and ~15x cheaper to cold-compile.
    _logits, probs = model_lib.forward(params, cfg.for_serving(), windows, rope)
    return probs


@partial(jax.jit, static_argnames=("window_size", "overlap_samples"))
def _make_windows_jit(samples, *, window_size: int, overlap_samples: int):
    from .ops.frontend import make_windows

    return make_windows(samples, window_size, overlap_samples)


def predict_and_stitch(
    params,
    cfg: Config,
    samples: np.ndarray | jax.Array,
    window_duration: float,
    overlap: float = 0.0,
    rope: Optional[RopeFreqs] = None,
):
    """(W, 2, N) windows -> (per-window probs, stitched probs, dpf)."""
    rope = rope if rope is not None else model_lib.make_rope(cfg.model)
    with _parity_precision(jax.tree.leaves(params)[0].dtype):
        probs = _predict_windows(params, cfg.model, jnp.asarray(samples), rope)
        probs = probs.astype(jnp.float32)
        duration_per_frame = window_duration / probs.shape[1]
        stitched = stitch_probs(probs, overlap, duration_per_frame)
    return np.asarray(probs), np.asarray(stitched), duration_per_frame


@partial(
    jax.jit, static_argnames=("cfg", "overlap", "window_duration", "valid_windows")
)
def predict_and_stitch_fused(
    params, cfg, windows, rope, window_duration: float, overlap: float,
    valid_windows: Optional[int] = None,
):
    """Model forward + crossfade stitch as ONE compiled XLA program.

    The hot path for ``audio_to_midi`` file transcription: all windows batched
    onto the MXU, stitching fused behind them, one device round trip.
    ``valid_windows``: when the batch is padded (e.g. to a whole per-device
    shard on a serving mesh), only the first ``valid_windows`` windows stitch.
    """
    _logits, probs = model_lib.forward(params, cfg.for_serving(), windows, rope)
    probs = probs.astype(jnp.float32)
    if valid_windows is not None and valid_windows < probs.shape[0]:
        probs = probs[:valid_windows]
    duration_per_frame = window_duration / probs.shape[1]
    return stitch_probs(probs, overlap, duration_per_frame)


@partial(
    jax.jit,
    static_argnames=("cfg", "src_rate", "overlap", "window_duration"),
)
def transcribe_samples_fused(
    params,
    cfg,
    samples: jax.Array,
    rope: RopeFreqs,
    src_rate: int,
    window_duration: float,
    overlap: float,
):
    """Raw in-memory audio -> stitched probabilities, ONE XLA program:
    resample -> normalize -> window -> model -> crossfade stitch.  This is the
    whole serving pipeline fused (BASELINE config #3); `cfg` here is a full
    Config (static)."""
    from .ops.frontend import prepare_windows

    dst_rate = cfg.data.sample_rate
    window_size = round(window_duration * dst_rate)
    overlap_samples = round(overlap * dst_rate)
    windows = prepare_windows(
        samples, src_rate, dst_rate, window_size, overlap_samples
    )
    compute = cfg.precision.compute_dtype
    return predict_and_stitch_fused(
        model_lib.cast_params(params, compute),
        cfg.model,
        windows.astype(compute),
        rope,
        window_duration,
        overlap,
    )


def transcribe_file(
    params,
    cfg: Config,
    input_file: str | Path,
    overlap: float = 0.5,
    rope: Optional[RopeFreqs] = None,
    max_windows_per_batch: int = 128,
    mesh=None,
    stage_times: Optional[dict] = None,
    fetch_stitched: bool = True,
):
    """File -> (stitched probs, duration_per_frame, events).

    ``mesh``: an optional ("ensemble", "data") jax.sharding.Mesh — the
    window batches shard over "data" (params replicated) so a multi-chip
    serving host transcribes one file across all its chips; the stitched
    result is identical to single-chip.

    The device does everything after decode: the raw audio transfers ONCE as
    f16 (the reference's decode dtype, python.rs:236-264) and windowing,
    model, crossfade stitch and eventization all run on-chip — for long files
    the windows stream through the model in fixed-size batches (one compiled
    shape, last batch padded).  Only the stitched probabilities and the dense
    event tensors come back to the host.  (The previous host-side windowing
    shipped overlapping f32 windows — 4.5x the bytes of the raw audio — over
    the host->device link, which dominated serving latency on tunneled
    setups; see SERVEBENCH.)

    ``stage_times``: pass a dict to record per-stage seconds (decode,
    transfer, window, model_stitch, eventize, fetch).  Instrumentation
    inserts a device sync after each stage, so the instrumented run measures
    the UN-overlapped stage costs — the normal (None) path stays fully
    async-dispatched and the runtime overlaps transfer with compute.
    ``fetch_stitched=False`` skips the (frames, 90) f32 fetch (MIDI-only
    serving needs just the events; returns stitched=None).
    """
    import time as _time

    from .data.loader import load_full_audio_f16
    from .ops.eventize import extract_events

    def _stage(name, t0, sync=None):
        if stage_times is not None:
            if sync is not None:
                jax.block_until_ready(sync)
            stage_times[name] = stage_times.get(name, 0.0) + _time.perf_counter() - t0
        return _time.perf_counter()

    window_duration = cfg.data.model_audio_length
    t = _time.perf_counter()
    raw = load_full_audio_f16(input_file, cfg.data.sample_rate)  # (2, N) f16
    t = _stage("decode", t)
    raw_dev = jnp.asarray(raw)
    t = _stage("transfer", t, sync=raw_dev)
    window_size = round(window_duration * cfg.data.sample_rate)
    overlap_samples = round(overlap * cfg.data.sample_rate)
    windows_dev = _make_windows_jit(
        raw_dev, window_size=window_size, overlap_samples=overlap_samples
    )
    # The transfer rides as f16; the model runs in the params' dtype (f32 for
    # checkpoint-parity inference, reference infer.py:27-32).
    param_dtype = jax.tree.leaves(params)[0].dtype
    windows_dev = windows_dev.astype(param_dtype)
    t = _stage("window", t, sync=windows_dev)
    rope = rope if rope is not None else model_lib.make_rope(cfg.model)
    num_windows = windows_dev.shape[0]

    data_size = 1
    if mesh is not None:
        from .parallel.mesh import batch_spec, shard_params

        data_size = mesh.shape["data"]
        if data_size > 1:
            params = shard_params(params, mesh)
            # Chunks shard over "data": round the chunk size to the mesh.
            max_windows_per_batch = max(
                data_size, max_windows_per_batch // data_size * data_size
            )

    def place(chunk):
        if mesh is None or data_size <= 1:
            return chunk
        return jax.device_put(chunk, batch_spec(mesh))

    if num_windows <= max_windows_per_batch:
        short = windows_dev
        if num_windows % data_size:  # pad to a whole per-device shard
            pad_to = -(-num_windows // data_size) * data_size
            short = jnp.pad(short, ((0, pad_to - num_windows), (0, 0), (0, 0)))
        with _parity_precision(param_dtype):
            stitched_dev = predict_and_stitch_fused(
                params, cfg.model, place(short), rope, window_duration, overlap,
                valid_windows=num_windows,
            )
    else:
        chunks = []
        for lo in range(0, num_windows, max_windows_per_batch):
            chunk = windows_dev[lo : lo + max_windows_per_batch]
            take = chunk.shape[0]
            if take < max_windows_per_batch:  # pad to the compiled shape
                chunk = jnp.pad(
                    chunk, ((0, max_windows_per_batch - take), (0, 0), (0, 0))
                )
            with _parity_precision(param_dtype):
                probs = _predict_windows(params, cfg.model, place(chunk), rope)
            chunks.append(probs[:take].astype(jnp.float32))
        all_probs = jnp.concatenate(chunks)
        duration_per_frame = window_duration / all_probs.shape[1]
        stitched_dev = stitch_probs(all_probs, overlap, duration_per_frame)
    t = _stage("model_stitch", t, sync=stitched_dev)

    # Reuse the rounded window_size from above: int() truncation could land
    # one sample short and yield a different frame count than the windows the
    # model actually saw, skewing every MIDI timestamp by one frame's worth.
    duration_per_frame = window_duration / cfg.model.output_frames(window_size)
    events = extract_events(stitched_dev)  # device scan; fetches compact table
    t = _stage("eventize", t)
    stitched = np.asarray(stitched_dev, np.float32) if fetch_stitched else None
    _stage("fetch", t)
    return stitched, duration_per_frame, events


def transcribe_file_streaming(
    params,
    cfg: Config,
    input_file: str | Path,
    overlap: float = 0.5,
    rope: Optional[RopeFreqs] = None,
    chunk_windows: int = 32,
    stage_times: Optional[dict] = None,
    fetch_stitched: bool = True,
    on_segment=None,
):
    """Chunked (streaming) transcription: decode once, then ship / infer /
    stitch in fixed-size window chunks — the transfer of chunk k+1 overlaps
    the model on chunk k, device memory is bounded by one chunk regardless of
    file length, and the first stitched segment (and first FINAL events) are
    available after one chunk instead of after the whole file.

    Output matches :func:`transcribe_file`: windows are cut at the same
    global sample offsets and chunked stitching uses the global
    float-accumulated base plan with one context window per chunk
    (ops/stitch.stitch_chunk) — bitwise identical at integral overlap frames
    (the production 0.5 s / 0.25 s overlaps at 20 ms frames; within 1 ulp of
    XLA FMA contraction otherwise), and the extracted MIDI events are
    identical.  Returns (stitched, duration_per_frame, events) like the
    batch path.

    ``on_segment(w0, seg)``: optional callback with each chunk's owned
    stitched rows (device array), for true streaming consumers.
    ``stage_times``: records decode/transfer/segment timings plus
    ``first_segment_s`` and ``first_event_s`` (time until the first stitched
    rows / the first FINALIZED event — one whose lookahead and release lie
    safely inside the emitted prefix — are known).
    """
    import math as _math
    import time as _time

    from .data.loader import load_full_audio_f16
    from .ops.eventize import extract_events
    from .ops.stitch import stitch_chunk, stitch_chunk_plan

    t_start = _time.perf_counter()
    window_duration = cfg.data.model_audio_length
    sample_rate = cfg.data.sample_rate
    window_size = round(window_duration * sample_rate)
    overlap_samples = round(overlap * sample_rate)
    step = window_size - overlap_samples
    fpw = cfg.model.output_frames(window_size)
    duration_per_frame = window_duration / fpw

    raw = load_full_audio_f16(input_file, sample_rate)  # (2, N) f16 host
    if stage_times is not None:
        stage_times["decode"] = _time.perf_counter() - t_start
    n = raw.shape[1]
    n_windows = max(1, _math.ceil((n - overlap_samples) / step))

    try:
        d_all, own_all, output_frames, ov = stitch_chunk_plan(
            n_windows, fpw, overlap, duration_per_frame
        )
    except ValueError:
        # Pairwise precondition violated (overlap >= ~half window): only the
        # sequential batch stitcher reproduces the chained blends.
        log.info("streaming stitch unavailable for overlap %s; using batch path", overlap)
        return transcribe_file(
            params, cfg, input_file, overlap=overlap, rope=rope,
            stage_times=stage_times, fetch_stitched=fetch_stitched,
        )

    rope = rope if rope is not None else model_lib.make_rope(cfg.model)
    param_dtype = jax.tree.leaves(params)[0].dtype
    chunk_len = (chunk_windows - 1) * step + window_size  # samples per chunk

    # Ship chunk k+1 before computing on chunk k: device_put is async, so the
    # DMA overlaps the model (double-buffered dispatch).
    def ship(w0: int):
        lo = w0 * step
        wc = min(chunk_windows, n_windows - w0)
        sl = np.asarray(raw[:, lo : lo + chunk_len])
        if sl.shape[1] < chunk_len:  # final chunk: same zero-pad as batch
            sl = np.pad(sl, ((0, 0), (0, chunk_len - sl.shape[1])))
        return jnp.asarray(sl), wc

    segs = []
    prev_window = jnp.zeros((fpw, cfg.model.output_vocab), jnp.float32)
    pending = ship(0)
    first_segment_s = None
    first_event_s = None
    emitted = 0
    with _parity_precision(param_dtype):
        for w0 in range(0, n_windows, chunk_windows):
            chunk_dev, wc = pending
            if w0 + chunk_windows < n_windows:
                pending = ship(w0 + chunk_windows)  # overlap next transfer
            windows_dev = _make_windows_jit(
                chunk_dev, window_size=window_size, overlap_samples=overlap_samples
            ).astype(param_dtype)
            probs = _predict_windows(params, cfg.model, windows_dev, rope)
            probs = probs[:wc].astype(jnp.float32)
            d = tuple(int(x) for x in d_all[w0 : w0 + wc])
            own = tuple(int(x) for x in own_all[w0 : w0 + wc])
            seg = stitch_chunk(
                prev_window, probs, d=d, own=own, ov=ov, first=(w0 == 0)
            )
            prev_window = probs[-1]
            segs.append(seg)
            emitted += seg.shape[0]
            if on_segment is not None:
                on_segment(w0, seg)
            if stage_times is not None and first_segment_s is None:
                jax.block_until_ready(seg)
                first_segment_s = _time.perf_counter() - t_start
                # First FINALIZED events: eventize the prefix and keep events
                # whose release + lookahead lie >= 16 frames inside it
                # (10-frame peak lookahead + 6-frame re-activation average,
                # common.rs:47-144).
                ev = extract_events(seg)
                safe = [e for e in ev if e[0] + e[2] + 16 <= seg.shape[0]]
                if safe:
                    first_event_s = _time.perf_counter() - t_start
    stitched_dev = jnp.concatenate(segs, axis=0)
    if stitched_dev.shape[0] < output_frames:  # zero tail the batch scatter leaves
        stitched_dev = jnp.pad(
            stitched_dev, ((0, output_frames - stitched_dev.shape[0]), (0, 0))
        )
    events = extract_events(stitched_dev)
    if stage_times is not None:
        stage_times["first_segment_s"] = first_segment_s
        stage_times["first_event_s"] = first_event_s
        stage_times["total_s"] = _time.perf_counter() - t_start
    stitched = np.asarray(stitched_dev, np.float32) if fetch_stitched else None
    return stitched, duration_per_frame, events
