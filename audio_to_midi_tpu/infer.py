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
from .ops.stitch import stitch_probs
from .parallel.mesh import make_mesh, replicated
from .train import checkpoint as ckpt

log = logging.getLogger(__name__)


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
    _logits, probs = model_lib.forward(params, cfg, windows, rope)
    return probs


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
    probs = _predict_windows(params, cfg.model, jnp.asarray(samples), rope)
    probs = probs.astype(jnp.float32)
    duration_per_frame = window_duration / probs.shape[1]
    stitched = stitch_probs(probs, overlap, duration_per_frame)
    return np.asarray(probs), np.asarray(stitched), duration_per_frame


@partial(jax.jit, static_argnames=("cfg", "overlap", "window_duration"))
def predict_and_stitch_fused(
    params, cfg, windows, rope, window_duration: float, overlap: float
):
    """Model forward + crossfade stitch as ONE compiled XLA program.

    The hot path for ``audio_to_midi`` file transcription: all windows batched
    onto the MXU, stitching fused behind them, one device round trip.
    """
    _logits, probs = model_lib.forward(params, cfg, windows, rope)
    probs = probs.astype(jnp.float32)
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
):
    """File -> (stitched probs, duration_per_frame, events).

    Short files run the fully-fused model+stitch program; long files stream
    their windows through the model in fixed-size batches (one compiled shape,
    last batch padded) and stitch once at the end — bounded memory and the
    batch size that benchmarks fastest on v5e.
    """
    from .data.loader import load_and_slice_full_audio
    from .ops.eventize import extract_events

    windows, window_duration = load_and_slice_full_audio(
        input_file,
        overlap=overlap,
        sample_rate=cfg.data.sample_rate,
        window_duration=cfg.data.model_audio_length,
    )
    rope = rope if rope is not None else model_lib.make_rope(cfg.model)
    num_windows = windows.shape[0]

    if num_windows <= max_windows_per_batch:
        stitched = np.asarray(
            predict_and_stitch_fused(
                params, cfg.model, jnp.asarray(windows), rope, window_duration, overlap
            )
        )
    else:
        chunks = []
        for lo in range(0, num_windows, max_windows_per_batch):
            chunk = windows[lo : lo + max_windows_per_batch]
            take = chunk.shape[0]
            if take < max_windows_per_batch:  # pad to the compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((max_windows_per_batch - take, *chunk.shape[1:]), chunk.dtype)]
                )
            probs = _predict_windows(params, cfg.model, jnp.asarray(chunk), rope)
            chunks.append(np.asarray(probs[:take], np.float32))
        all_probs = np.concatenate(chunks)
        duration_per_frame = window_duration / all_probs.shape[1]
        stitched = np.asarray(
            stitch_probs(jnp.asarray(all_probs), overlap, duration_per_frame)
        )

    duration_per_frame = window_duration / cfg.model.output_frames(
        int(window_duration * cfg.data.sample_rate)
    )
    events = extract_events(stitched)
    return stitched, duration_per_frame, events
