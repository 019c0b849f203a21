"""Evaluation metrics — fully on-device.

``detailed_event_loss`` reimplements reference infer.py:94-158: eventize the
predicted probabilities, re-rasterize them, and compare against the expected
frame labels:
  * full_diff ("eventized diff") = sum |rasterized(eventized(probs)) - expected|
  * phantom_notes_diff = count of predicted-only cells
  * missed_notes_diff  = sum of expected probs at missed cells
  * notes_hit, hit_rate = hit / (hit + phantom + missed)

Unlike the reference (device -> host -> Rust round trip per sample), the whole
computation is one jitted program over the dense eventizer output.

``configure_tensorboard`` mirrors reference metrics.py:5-10.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .ops.eventize import extract_events_dense
from .ops.rasterize import rasterize_dense


@dataclass
class DetailedEventLoss:
    full_diff: float
    phantom_notes_diff: float
    missed_notes_diff: float
    notes_hit: int
    hit_rate: float
    visualization: Any | None = None


@jax.jit
def detailed_event_loss_device(
    output_probs: jax.Array, expected: jax.Array
) -> dict[str, jax.Array]:
    """(N, 90) predicted probs + (>=N, 90) expected labels -> metric dict."""
    predicted = rasterize_dense(*extract_events_dense(output_probs))
    expected = expected[: predicted.shape[0]].astype(jnp.float32)

    full_diff = jnp.sum(jnp.abs(predicted - expected))
    played_predicted = predicted > 0
    played_expected = expected > 0

    phantom = jnp.sum(played_predicted & ~played_expected)
    missed = jnp.sum(jnp.where(played_expected & ~played_predicted, expected, 0.0))
    hit = jnp.sum(played_predicted & played_expected)

    denom = hit + phantom + missed
    hit_rate = jnp.where(denom > 0, hit / denom, 1.0)
    return {
        "full_diff": full_diff,
        "phantom_notes_diff": phantom.astype(jnp.float32),
        "missed_notes_diff": missed,
        "notes_hit": hit,
        "hit_rate": hit_rate,
        "predicted_raster": predicted,
    }


def detailed_event_loss(
    output_probs, expected, generate_visualization: bool = False
) -> DetailedEventLoss:
    """Host-facing wrapper matching reference infer.py:94-158."""
    out = detailed_event_loss_device(jnp.asarray(output_probs), jnp.asarray(expected))
    visualization = None
    if generate_visualization:
        visualization = _visualize(np.asarray(output_probs), np.asarray(expected))
    return DetailedEventLoss(
        full_diff=float(out["full_diff"]),
        phantom_notes_diff=float(out["phantom_notes_diff"]),
        missed_notes_diff=float(out["missed_notes_diff"]),
        notes_hit=int(out["notes_hit"]),
        hit_rate=float(out["hit_rate"]),
        visualization=visualization,
    )


def _visualize(output_probs: np.ndarray, expected: np.ndarray):
    """Two-panel inferred/expected heatmap (reference infer.py:131-149)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    norm = plt.Normalize(vmin=0.0, vmax=1.0)
    fig, (ax1, ax2) = plt.subplots(nrows=2, ncols=1)
    n = output_probs.shape[0]
    x = np.linspace(0.0, n, n)
    y = np.arange(output_probs.shape[1])
    ax1.pcolor(x, y, output_probs.T, cmap="viridis", norm=norm)
    ax1.set(ylabel="Inferred events")
    ax2.pcolor(x[: expected.shape[0]], y, expected[:n].T, cmap="viridis", norm=norm)
    ax2.set(xlabel="Time [frame]", ylabel="Expected events")
    return fig


def configure_tensorboard(run_dir: str | None = None):
    """tensorboardX writer in runs/<ISO-timestamp> (reference metrics.py:5-10)."""
    from tensorboardX import SummaryWriter

    if run_dir is None:
        run_dir = f"runs/{datetime.datetime.now().isoformat()}"
    return SummaryWriter(run_dir)
