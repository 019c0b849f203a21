"""Test-set evaluation: per-sample loss / hit-rate / eventized-diff.

Reference semantics (train.py:75-209): every sample in the testset dir is
split into its 5 s windows (cache skipped); each window is run through every
ensemble member; per sample the window losses are averaged and the window
probs are CONCATENATED (not crossfade-stitched — train.py:150) before
``detailed_event_loss``.  We batch all windows of a sample through the model
at once instead of the reference's window-at-a-time pretend-batch-of-1 loop.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import loader
from ..metrics import detailed_event_loss
from ..models import model as model_lib
from ..models.rope import RopeFreqs
from .loss import sigmoid_bce_sum


# Byte-budget cache (reference train.py:75-84 uses a bare lru_cache(4); a
# long testset of windows can be GBs, so bound by SIZE as well as count —
# testsets above the per-entry budget are reloaded on every eval instead of
# pinned in host RAM).
_TESTSET_CACHE: dict[tuple, list] = {}
_TESTSET_CACHE_MAX_ENTRIES = 4
_TESTSET_CACHE_ENTRY_BUDGET = 2 * 1024**3  # bytes


def _load_test_set_uncached(testset_dir: str, num_frames: int, sample_rate: int, duration: float):
    names = loader.load_sample_names(testset_dir)
    batches = []
    for name in names:
        audio, events, _ = loader.load_events_and_audio(
            testset_dir, [name], sample_rate, duration, num_frames, skip_cache=True
        )
        batches.append((name, np.stack(audio), np.stack(events)))
    return batches


def _load_test_set_cached(testset_dir: str, num_frames: int, sample_rate: int, duration: float):
    key = (testset_dir, num_frames, sample_rate, duration)
    if key in _TESTSET_CACHE:
        return _TESTSET_CACHE[key]
    batches = _load_test_set_uncached(testset_dir, num_frames, sample_rate, duration)
    nbytes = sum(a.nbytes + e.nbytes for _, a, e in batches)
    if nbytes <= _TESTSET_CACHE_ENTRY_BUDGET:
        while len(_TESTSET_CACHE) >= _TESTSET_CACHE_MAX_ENTRIES:
            _TESTSET_CACHE.pop(next(iter(_TESTSET_CACHE)))
        _TESTSET_CACHE[key] = batches
    return batches


def load_test_set(testset_dir: str | Path, num_frames: int, cfg: Config):
    return _load_test_set_cached(
        str(testset_dir), num_frames, cfg.data.sample_rate, cfg.data.model_audio_length
    )


@partial(jax.jit, static_argnames=("cfg", "ensemble"))
def _infer_windows(params, cfg, audio, labels, rope, ensemble: bool):
    """-> (logits, probs, per-window losses); leading E axis if ensemble."""
    def member(p):
        logits, probs = model_lib.forward(p, cfg.model, audio, rope)
        losses = sigmoid_bce_sum(
            logits.astype(jnp.float32), labels.astype(jnp.float32)
        )
        return logits, probs, losses

    if ensemble:
        return jax.vmap(member)(params)
    return member(params)


def compute_testset_loss_individual(
    params,
    cfg: Config,
    testset_dir: str | Path,
    num_model_output_frames: int,
    rope: RopeFreqs,
    ensemble: bool = True,
    generate_visualizations: bool | None = None,
) -> dict[str, dict[str, Any]]:
    batches = load_test_set(testset_dir, num_model_output_frames, cfg)
    if generate_visualizations is None:
        generate_visualizations = len(batches) < 30

    max_windows_per_batch = 64
    loss_map: dict[str, dict[str, Any]] = {}
    for name, audio, labels in batches:
        # Long samples stream their windows in fixed-size batches to bound
        # device memory.  Every chunk is padded to a power-of-two bucket
        # (<= max_windows_per_batch) so a testset of varied durations
        # compiles at most log2(64)+1 shapes instead of one per distinct
        # window count.
        probs_chunks, losses_chunks = [], []
        for lo in range(0, audio.shape[0], max_windows_per_batch):
            a = audio[lo : lo + max_windows_per_batch]
            l = labels[lo : lo + max_windows_per_batch]
            take = a.shape[0]
            bucket = 1 << (take - 1).bit_length() if take > 1 else 1
            if take < bucket:
                pad = bucket - take
                a = np.concatenate([a, np.zeros((pad, *a.shape[1:]), a.dtype)])
                l = np.concatenate([l, np.zeros((pad, *l.shape[1:]), l.dtype)])
            _logits, p_c, l_c = _infer_windows(
                params, cfg, jnp.asarray(a), jnp.asarray(l), rope, ensemble
            )
            p_c = np.asarray(p_c, np.float32)
            l_c = np.asarray(l_c, np.float32)
            if not ensemble:
                p_c, l_c = p_c[None], l_c[None]
            probs_chunks.append(p_c[:, :take])
            losses_chunks.append(l_c[:, :take])
        probs = np.concatenate(probs_chunks, axis=1)
        losses = np.concatenate(losses_chunks, axis=1)

        e = probs.shape[0]
        test_losses, hit_rates, eventized, phantom, missed, figs = [], [], [], [], [], []
        stitched_events = labels.reshape(-1, labels.shape[-1])
        for i in range(e):
            stitched_probs = probs[i].reshape(-1, probs.shape[-1])
            detail = detailed_event_loss(
                stitched_probs, stitched_events,
                generate_visualization=generate_visualizations,
            )
            test_losses.append(losses[i].mean())
            hit_rates.append(detail.hit_rate)
            eventized.append(detail.full_diff)
            phantom.append(detail.phantom_notes_diff)
            missed.append(detail.missed_notes_diff)
            if generate_visualizations:
                figs.append(detail.visualization)
        loss_map[name] = {
            "loss": np.array(test_losses),
            "hit_rate": np.array(hit_rates),
            "eventized_diff": np.array(eventized),
            "phantom_note_diff": np.array(phantom),
            "missed_note_diff": np.array(missed),
            "visualizations": figs,
        }
    return loss_map


def compute_testset_loss(
    params,
    cfg: Config,
    testset_dir: str | Path,
    num_model_output_frames: int,
    rope: RopeFreqs,
    ensemble: bool = True,
    generate_visualizations: bool | None = None,
):
    """Averages over samples -> (loss (E,), hit_rate (E,), eventized (E,), figs)."""
    per_sample = compute_testset_loss_individual(
        params, cfg, testset_dir, num_model_output_frames, rope, ensemble,
        generate_visualizations=generate_visualizations,
    )
    first = next(iter(per_sample.values()))
    loss = np.zeros_like(first["loss"])
    hit = np.zeros_like(first["hit_rate"])
    eventized = np.zeros_like(first["eventized_diff"])
    figs = []
    for v in per_sample.values():
        loss += v["loss"]
        hit += v["hit_rate"]
        eventized += v["eventized_diff"]
        figs += v["visualizations"]
    n = len(per_sample)
    return loss / n, hit / n, eventized / n, figs
