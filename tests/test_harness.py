"""Smoke tests for the module __main__ harnesses and small utilities."""

import numpy as np

from audio_to_midi_tpu.data import synthetic
from audio_to_midi_tpu.data.__main__ import main as data_main
from audio_to_midi_tpu.train.checkpoint import score_by_checkpoint_metrics
from audio_to_midi_tpu.utils.visualize import plot_prob_dist


def test_data_smoke_harness(tmp_path, capsys, monkeypatch):
    synthetic.make_synthetic_dataset(tmp_path, num_samples=2, duration_s=6.0, seed=4)
    rc = data_main([str(tmp_path), "--batches", "1", "--batch-size", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "batch 0" in out and "audio (2, 2, 80000)" in out


def test_score_by_checkpoint_metrics():
    assert score_by_checkpoint_metrics({"a": 1.0, "b": 3.0}) == 2.0


def test_plot_prob_dist():
    import matplotlib

    matplotlib.use("Agg")
    fig = plot_prob_dist("velocity", np.linspace(0, 1, 10))
    assert fig is not None
