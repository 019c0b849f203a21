"""Data layer tests: audio round-trips, CSV parsing, windowing, augmentations,
loaders over a synthetic dataset."""

import numpy as np
import pytest

from audio_to_midi_tpu.config import (
    MODEL_AUDIO_LENGTH,
    SAMPLE_RATE,
    TransformSettings,
)
from audio_to_midi_tpu.data import audio_io, labels, loader, synthetic
from audio_to_midi_tpu.ops import midi_io


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("dataset")
    names = synthetic.make_synthetic_dataset(d, num_samples=3, duration_s=6.0, seed=1)
    return d, names


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.random((2, 1000), dtype=np.float32) - 0.5) * 0.9
    audio_io.write_wav(tmp_path / "x.wav", x, SAMPLE_RATE)
    y = audio_io.decode_audio(tmp_path / "x.wav", SAMPLE_RATE)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_decode_resamples(tmp_path):
    t = np.arange(8000) / 8000.0
    x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32) * 0.5
    audio_io.write_wav(tmp_path / "x.wav", x, 8000)
    y = audio_io.decode_audio(tmp_path / "x.wav", 16000)
    assert abs(y.shape[1] - 16000) < 20


def test_normalize_loudness_matches_reference_semantics():
    x = np.zeros((2, 100), np.float32)
    x[0, 0] = 0.04  # below the 0.05 silence guard
    np.testing.assert_array_equal(audio_io.normalize_loudness_np(x), x)
    y = np.ones((2, 100), np.float32) * 0.5
    out = audio_io.normalize_loudness_np(y)
    np.testing.assert_allclose(np.mean(out**2), 1.0, rtol=1e-5)


def test_csv_parse_quantization(tmp_path):
    p = tmp_path / "l.csv"
    p.write_text(
        "% comment line\n"
        "0.0,0.0,21,0.0\n"        # first data row: skipped (reference quirk)
        "1.0, 0.5, 60, 0.73\n"
        "2.005, 0.001, 21, 1.0\n"
    )
    events = labels.parse_events_csv(p, duration_per_frame=0.02)
    assert events == [(50, 39, 25, 7), (100, 0, 1, 10)]


def test_load_sample_names_enforces_pairing(tmp_path, dataset):
    d, names = dataset
    assert loader.load_sample_names(d) == sorted(names)
    (tmp_path / "orphan.csv").write_text("a,b,c,d\n")
    with pytest.raises(ValueError):
        loader.load_sample_names(tmp_path)


def test_load_events_and_audio_windows(dataset):
    d, names = dataset
    audio, events, out_names = loader.load_events_and_audio(
        d, [names[0]], SAMPLE_RATE, MODEL_AUDIO_LENGTH, 250
    )
    # 6 s sample -> split 0 full (5 s), split 1 only 1 s -> dropped (<50%)
    assert out_names == [f"{names[0]}+0"]
    assert audio[0].shape == (2, 80000)
    assert events[0].shape == (250, 90)
    assert events[0].max() > 0  # labels rendered


def test_window_drop_rule(tmp_path):
    # 8 s -> splits of 5 s and 3 s: both kept (3 s > 2.5 s)
    events = synthetic.random_events(8.0, 5, seed=3)
    audio = synthetic.synth_performance(events, 8.0)
    audio_io.write_wav(tmp_path / "s.wav", audio, SAMPLE_RATE)
    labels.write_events_csv(tmp_path / "s.csv", events)
    a, e, n = loader.load_events_and_audio(
        tmp_path, ["s"], SAMPLE_RATE, MODEL_AUDIO_LENGTH, 250
    )
    assert n == ["s+0", "s+1"]


def test_sample_cache(tmp_path, dataset, monkeypatch):
    d, names = dataset
    monkeypatch.setenv("SAMPLE_CACHE_DIR", str(tmp_path / "cache"))
    f = loader.resolve_audio_file(d / names[0])
    a1 = loader.load_audio_sample(f, SAMPLE_RATE)
    cached = list((tmp_path / "cache").rglob("*.npy")) + list(
        (tmp_path / "cache").rglob("*.a2mc")  # native plane cache format
    )
    assert len(cached) == 1
    a2 = loader.load_audio_sample(f, SAMPLE_RATE)
    np.testing.assert_array_equal(a1, a2)
    # corrupt entry self-heals
    cached[0].write_bytes(b"garbage")
    a3 = loader.load_audio_sample(f, SAMPLE_RATE)
    np.testing.assert_array_equal(a1, a3)


def test_augmentations_shapes_and_determinism():
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((8, 2, 1000)).astype(np.float32)
    lab = rng.random((8, 50, 90)).astype(np.float32)
    a2, l2 = audio.copy(), lab.copy()
    settings = TransformSettings()
    from audio_to_midi_tpu.data import augment

    augment.transform_for_training(a2, l2, settings, np.random.default_rng(0))
    assert a2.shape == audio.shape and l2.shape == lab.shape
    assert not np.array_equal(a2, audio)
    # label smoothing clamps
    assert l2.min() >= settings.label_smoothing_alpha - 1e-7
    assert l2.max() <= 1 - settings.label_smoothing_alpha + 1e-7
    # deterministic under the same rng seed
    a3, l3 = audio.copy(), lab.copy()
    augment.transform_for_training(a3, l3, settings, np.random.default_rng(0))
    np.testing.assert_array_equal(a2, a3)


def test_threaded_loader(dataset):
    d, names = dataset
    with loader.ThreadedBatchLoader(
        d, batch_size=2, num_model_output_frames=250, epochs=4
    ) as ldr:
        events, audio = next(iter(ldr))
    assert audio.shape == (2, 2, 80000)
    assert events.shape == (2, 250, 90)
    assert audio.dtype == np.float16


def test_grain_loader(dataset):
    d, names = dataset
    it = loader.create_dataset_loader(
        d, batch_size=2, num_workers=0, num_epochs=2, output_divisions=250
    )
    events, audio = next(it)
    assert audio.shape == (2, 2, 80000)
    assert events.shape == (2, 250, 90)


@pytest.mark.slow
def test_grain_loader_multiprocess_prefetch(dataset):
    """num_workers > 0 exercises the grain MultiprocessingOptions prefetch
    branch (loader.py) — workers must pickle the settings and produce the
    same batch geometry as the in-process path."""
    d, names = dataset
    it = loader.create_dataset_loader(
        d, batch_size=2, num_workers=1, num_epochs=2, output_divisions=250
    )
    events, audio = next(it)
    assert audio.shape == (2, 2, 80000)
    assert events.shape == (2, 250, 90)
    assert np.isfinite(np.asarray(audio, np.float32)).all()


def test_slice_full_audio(dataset):
    d, names = dataset
    f = loader.resolve_audio_file(d / names[0])
    windows, dur = loader.load_and_slice_full_audio(f, overlap=0.5)
    assert dur == MODEL_AUDIO_LENGTH
    assert windows.shape[1:] == (2, 80000)
    assert windows.shape[0] == 2  # 6 s with 4.5 s step -> 2 windows


def test_midi_write_read_roundtrip(tmp_path):
    events = [(0, 39, 25, 7), (50, 45, 10, 7)]
    out = tmp_path / "x.mid"
    midi_io.write_midi_file(events, 0.02, out)
    msgs = midi_io.read_midi_file(out)
    notes = [(t, k, kind) for t, kind, k, v in msgs if kind.startswith("note")]
    # key biased +21, tempo 120 -> 1 beat = 0.5 s = 480 ticks; frame = 0.02 s
    assert (0, 60, "note_on") in notes
    assert (480, 60, "note_off") in notes  # 25 frames * 0.02 s = 0.5 s
    assert (960, 66, "note_on") in notes  # frame 50 * 0.02 s = 1 s = 960 ticks


def test_window_memo(dataset):
    """Per-sample window memo: repeat loads reuse the rasterized windows
    (identity), skip_cache bypasses, and results are equal either way."""
    d, names = dataset
    loader._WINDOW_MEMO.clear()
    loader._WINDOW_MEMO_BYTES[0] = 0
    a1, e1, n1 = loader.load_events_and_audio(d, names[:1], 16000, 5.0, 250)
    a2, e2, n2 = loader.load_events_and_audio(d, names[:1], 16000, 5.0, 250)
    assert n1 == n2
    assert all(x is y for x, y in zip(a1, a2))  # memo hit returns same arrays
    a3, e3, n3 = loader.load_events_and_audio(
        d, names[:1], 16000, 5.0, 250, skip_cache=True
    )
    assert not any(x is y for x, y in zip(a1, a3))
    for x, y in zip(a1, a3):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(e1, e3):
        np.testing.assert_array_equal(x, y)
    assert loader._WINDOW_MEMO_BYTES[0] > 0


def test_window_memo_over_budget_stays_writable(dataset, monkeypatch):
    """A sample too large for the memo budget is never cached, so the caller
    keeps exclusive, WRITABLE arrays (the read-only freeze applies only to
    entries actually shared through the memo)."""
    d, names = dataset
    loader._WINDOW_MEMO.clear()
    loader._WINDOW_MEMO_BYTES[0] = 0
    monkeypatch.setattr(loader, "_WINDOW_MEMO_BUDGET", 1)
    a1, e1, _ = loader.load_events_and_audio(d, names[:1], 16000, 5.0, 250)
    assert not loader._WINDOW_MEMO
    assert all(a.flags.writeable for a in a1) and all(
        e.flags.writeable for e in e1
    )
    a1[0][:] = 0.0  # caller-owned: in-place mutation must be legal

    monkeypatch.setattr(loader, "_WINDOW_MEMO_BUDGET", 2 * 1024**3)
    b1, f1, _ = loader.load_events_and_audio(d, names[:1], 16000, 5.0, 250)
    assert loader._WINDOW_MEMO  # cached now -> shared entries are frozen
    assert not any(a.flags.writeable for a in b1)


def test_synthesis_families_disjoint_and_reproducible(tmp_path):
    """Cross-family generalization harness (VERDICT r03 next #3): the two
    synthesis families are structurally different generators, each seeded
    draw reproduces exactly, and family="percussive" is byte-identical to
    the historical variety=True path (so earlier GENBENCH runs stay
    comparable)."""
    perc = tmp_path / "perc"
    perc2 = tmp_path / "perc2"
    var = tmp_path / "var"
    sus = tmp_path / "sus"
    kw = dict(num_samples=2, duration_s=3.0, notes_per_sample=4, seed=5)
    synthetic.make_synthetic_dataset(perc, family="percussive", **kw)
    synthetic.make_synthetic_dataset(perc2, family="percussive", **kw)
    synthetic.make_synthetic_dataset(var, variety=True, **kw)
    synthetic.make_synthetic_dataset(sus, family="sustained", **kw)
    for name in ("sample_000.wav", "sample_001.wav", "sample_000.csv"):
        assert (perc / name).read_bytes() == (perc2 / name).read_bytes()
        assert (perc / name).read_bytes() == (var / name).read_bytes()
    a_p = audio_io.decode_audio(perc / "sample_000.wav", 16000)
    a_s = audio_io.decode_audio(sus / "sample_000.wav", 16000)
    assert np.isfinite(a_s).all() and np.abs(a_s).max() > 1e-4
    assert a_p.shape == a_s.shape
    # Same events CSV (same seed path), different voice.
    assert (perc / "sample_000.csv").read_bytes() == (
        sus / "sample_000.csv"
    ).read_bytes()
    assert not np.array_equal(a_p, a_s)


def test_mixed_family_draws_both_generators(tmp_path):
    """family="mixed" (the corpus-coverage twin of the transfer experiment)
    alternates the two disjoint families deterministically by sample index —
    exactly 50/50 at any corpus size (advice r04: a stochastic mix can skew
    small corpora)."""
    # The resolver is index-deterministic.
    fams = [synthetic._resolve_family("mixed", i) for i in range(6)]
    assert fams == ["percussive", "sustained"] * 3
    assert synthetic._resolve_family("sustained", 4) == "sustained"
    # Dataset-level: because the family choice consumes no rng draw, a
    # mixed dataset's even samples are byte-identical to the pure
    # percussive dataset and odd samples to the pure sustained one.
    kw = dict(num_samples=4, duration_s=2.0, notes_per_sample=3, seed=11)
    mix = tmp_path / "mix"
    perc = tmp_path / "perc"
    sus = tmp_path / "sus"
    synthetic.make_synthetic_dataset(mix, family="mixed", **kw)
    synthetic.make_synthetic_dataset(perc, family="percussive", **kw)
    synthetic.make_synthetic_dataset(sus, family="sustained", **kw)
    for i in range(kw["num_samples"]):
        wav, csv = f"sample_{i:03d}.wav", f"sample_{i:03d}.csv"
        twin = perc if i % 2 == 0 else sus
        assert (mix / wav).read_bytes() == (twin / wav).read_bytes()
        assert (mix / csv).read_bytes() == (twin / csv).read_bytes()
        a = audio_io.decode_audio(mix / wav, 16000)
        assert np.isfinite(a).all() and np.abs(a).max() > 1e-4


def test_sustained_family_structure():
    """The sustained voice's structural controls actually engage:
    inharmonicity shifts partials off exact harmonics, slow attack delays
    the peak, tremolo modulates the envelope."""
    base = synthetic.synth_note(60, 1.0, 16000, 1.0)
    slow = synthetic.synth_note(60, 1.0, 16000, 1.0, attack_s=0.05)
    # Percussive attack reaches ~full amplitude within 10 ms; a 50 ms linear
    # attack is still ramping there, so early energy must be much lower.
    t10 = int(0.010 * 16000)
    rms = lambda x: float(np.sqrt(np.mean(np.square(x))))
    assert rms(slow[:t10]) < 0.4 * rms(base[:t10])
    inh = synthetic.synth_note(60, 1.0, 16000, 1.0, inharmonicity=1e-3)
    assert not np.array_equal(base, inh)
    trem = synthetic.synth_note(60, 2.0, 16000, 1.0, decay=0.0, tremolo=(0.5, 4.0))
    flat = synthetic.synth_note(60, 2.0, 16000, 1.0, decay=0.0)
    # 4 Hz depth-0.5 tremolo: windowed RMS must dip substantially vs flat
    # (31 ms windows resolve the 250 ms tremolo period's troughs).
    n = 16000 // 32
    rms_t = [float(np.sqrt(np.mean(trem[i : i + n] ** 2))) for i in range(0, 2 * 16000 - n, n)]
    rms_f = [float(np.sqrt(np.mean(flat[i : i + n] ** 2))) for i in range(0, 2 * 16000 - n, n)]
    assert min(rms_t[2:]) < 0.7 * min(rms_f[2:])
