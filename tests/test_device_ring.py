"""Device-resident input ring (data/device_ring.py): push/wrap semantics,
on-device sampling, feeder draining, and the train-loop integration that
replaces per-step host batches with ring sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.data.device_ring import DeviceInputRing, _Feeder


def _chunk(start, w=4, n=32, f=8, k=90):
    """Deterministic feed chunk whose window i is filled with (start + i)."""
    ids = np.arange(start, start + w, dtype=np.float16)
    audio = np.broadcast_to(ids[:, None, None], (w, 2, n)).copy()
    labels = np.broadcast_to(ids[:, None, None], (w, f, k)).copy()
    return audio, labels


def test_ring_push_and_wraparound():
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    ring.push(*_chunk(0))
    assert ring.filled == 4 and ring.capacity == 8
    ring.push(*_chunk(4))
    assert ring.filled == 8
    # Third push wraps: slots 0..3 now hold windows 8..11.
    ring.push(*_chunk(8))
    got = np.asarray(ring._audio[:, 0, 0], np.float32)
    np.testing.assert_array_equal(got, [8, 9, 10, 11, 4, 5, 6, 7])
    assert ring.filled == 8
    assert ring.pushed_windows == 12


def test_ring_capacity_rounds_up_to_chunk():
    ring = DeviceInputRing(capacity=6, chunk_windows=4)
    assert ring.capacity == 8


def test_ring_sample_draws_only_pushed_content():
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    ring.push(*_chunk(0))
    audio_mb, labels_mb = ring.sample(jax.random.PRNGKey(0), batch=8, minibatch=2, settings=None)
    assert audio_mb.shape == (4, 2, 2, 32)
    assert labels_mb.shape == (4, 2, 8, 90)
    ids = np.asarray(audio_mb[:, :, 0, 0], np.float32).ravel()
    # Only windows 0..3 are filled; sampling must not touch empty slots.
    assert set(ids) <= {0.0, 1.0, 2.0, 3.0}
    # Audio and labels stay paired.
    label_ids = np.asarray(labels_mb[:, :, 0, 0], np.float32).ravel()
    np.testing.assert_array_equal(ids, label_ids)


def test_ring_sample_with_augmentation_runs():
    from audio_to_midi_tpu.config import TransformSettings

    ring = DeviceInputRing(capacity=8, chunk_windows=8)
    audio, labels = _chunk(0, w=8)
    ring.push(audio, labels)
    audio_mb, labels_mb = ring.sample(
        jax.random.PRNGKey(1), batch=8, minibatch=4, settings=TransformSettings()
    )
    assert np.isfinite(np.asarray(audio_mb)).all()
    assert np.isfinite(np.asarray(labels_mb)).all()
    # label smoothing clamps into [alpha, 1-alpha]
    assert float(jnp.min(labels_mb)) >= 0.005 - 1e-6


def test_feeder_drains_and_reports_exhaustion():
    chunks = [(_chunk(i * 4)[1], _chunk(i * 4)[0]) for i in range(3)]  # (events, audio)
    feeder = _Feeder(iter(chunks), depth=2)
    ring = DeviceInputRing(capacity=16, chunk_windows=4)
    ring.pull(feeder, min_fill=12)
    assert ring.filled == 12
    ring.pull(feeder, min_fill=16)  # source exhausted; returns with what we have
    assert ring.filled == 12
    assert feeder.exhausted


def test_feeder_exhausted_before_any_data_raises():
    feeder = _Feeder(iter([]), depth=2)
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    with pytest.raises(RuntimeError):
        ring.pull(feeder, min_fill=4)


def test_feeder_source_exception_propagates():
    """A loader crash in the feeder thread must abort training (RuntimeError
    from the crashed source), not read as normal exhaustion that leaves the
    loop silently resampling a frozen ring pool."""

    def bad_source():
        yield (_chunk(0)[1], _chunk(0)[0])
        raise OSError("corrupt audio file")

    feeder = _Feeder(bad_source(), depth=2)
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    with pytest.raises(RuntimeError, match="input feed thread failed") as ei:
        # First pull may land the good chunk; keep pulling until the error
        # sentinel surfaces.
        for _ in range(4):
            ring.pull(feeder, min_fill=8)
    assert isinstance(ei.value.__cause__, OSError)


def test_undersized_feed_chunk_raises():
    """Chunks smaller than the ring update size would be silently dropped
    (the ring could never fill) — must fail loudly with the sizes."""
    chunks = [(_chunk(0, w=2)[1], _chunk(0, w=2)[0])]
    feeder = _Feeder(iter(chunks), depth=2)
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    with pytest.raises(ValueError, match="2 windows"):
        ring.pull(feeder, min_fill=4)


@pytest.mark.slow
def test_train_loop_with_ring(tmp_path):
    """loop.train with the default ring feed: loss finite, params move, and
    training keeps going past a finite source (epoch-style reuse)."""
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel import make_mesh, shard_params
    from audio_to_midi_tpu.train import loop, setup_optimizers
    from tests.test_e2e import E2E_CFG

    cfg = dataclasses.replace(
        E2E_CFG,
        train=dataclasses.replace(
            E2E_CFG.train, num_steps=4, augment_on_device=True,
            input_ring_capacity=16,
        ),
    )
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    params0 = jax.tree.map(np.asarray, params)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    rng = np.random.default_rng(0)
    b = cfg.train.batch_size
    n = cfg.data.samples_per_window

    def batches(num=2):  # finite source shorter than num_steps
        for _ in range(num):
            audio = rng.standard_normal((b, 2, n)).astype(np.float32)
            labels = (rng.random((b, num_frames, 90)) > 0.95).astype(np.float32)
            yield labels, audio

    params, state, opt_state = loop.train(
        cfg, params, state, tx, opt_state, batches(), None, sched, rope,
        num_frames, mesh=mesh,
    )
    moved = False
    for new, old in zip(jax.tree.leaves(params), jax.tree.leaves(params0)):
        arr = np.asarray(new)
        assert np.isfinite(arr).all()
        moved = moved or not np.array_equal(arr, np.asarray(old))
    assert moved


def test_persistent_undersized_chunks_raise_not_hang():
    """A source whose batch size shrinks mid-stream (first chunk full, rest
    undersized) used to spin the blocking fill loop through the whole
    dataset pushing nothing; two undersized chunks in a row must raise."""
    chunks = [(_chunk(0)[1], _chunk(0)[0])] + [
        (_chunk(4, w=2)[1], _chunk(4, w=2)[0]) for _ in range(50)
    ]
    feeder = _Feeder(iter(chunks), depth=2)
    ring = DeviceInputRing(capacity=16, chunk_windows=4)
    with pytest.raises(ValueError, match="2 windows"):
        ring.pull(feeder, min_fill=16)
    assert ring.filled == 4  # the one full chunk landed


def test_single_trailing_partial_chunk_tolerated():
    """A finite source's one trailing partial chunk is dropped silently
    (single compiled update shape), not an error."""
    chunks = [
        (_chunk(0)[1], _chunk(0)[0]),
        (_chunk(4)[1], _chunk(4)[0]),
        (_chunk(8, w=2)[1], _chunk(8, w=2)[0]),  # trailing partial
    ]
    feeder = _Feeder(iter(chunks), depth=2)
    ring = DeviceInputRing(capacity=16, chunk_windows=4)
    ring.pull(feeder, min_fill=16)  # exhausts the source
    assert ring.filled == 8
    assert feeder.exhausted


def test_pull_max_chunks_drains_that_many():
    """Once min_fill is satisfied, max_chunks caps the non-blocking refresh
    per call (and None means drain everything ready)."""
    import time

    chunks = [(_chunk(i * 4)[1], _chunk(i * 4)[0]) for i in range(6)]
    feeder = _Feeder(iter(chunks), depth=8)
    time.sleep(0.3)  # let the feeder thread queue everything
    ring = DeviceInputRing(capacity=64, chunk_windows=4)
    ring.pull(feeder, min_fill=4, max_chunks=0)
    first = ring.pushed_windows
    assert first >= 4  # blocked only until min_fill
    ring.pull(feeder, min_fill=4, max_chunks=2)
    assert ring.pushed_windows == first + 8  # exactly two more chunks
    ring.pull(feeder, min_fill=4, max_chunks=None)  # drain the rest
    assert ring.pushed_windows == 24


def test_take_stats_reuse_telemetry():
    """Reuse telemetry: interval counters, reuse factor, and the warn-only
    threshold (VERDICT r03 weak #5 — reuse degradation must be visible)."""
    import warnings

    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    ring.push(*_chunk(0))
    ring.push(*_chunk(4))
    for i in range(4):
        ring.sample(jax.random.PRNGKey(i), batch=8, minibatch=4, settings=None)

    stats = ring.take_stats()
    assert stats["interval_refreshed_windows"] == 8
    assert stats["interval_sampled_windows"] == 32
    assert stats["reuse_factor"] == pytest.approx(4.0)
    assert stats["pushed_windows"] == 8 and stats["sampled_windows"] == 32
    assert stats["filled"] == 8 and stats["capacity"] == 8

    # Interval counters reset; lifetime counters persist.
    ring.sample(jax.random.PRNGKey(9), batch=8, minibatch=4, settings=None)
    stats2 = ring.take_stats()
    assert stats2["interval_refreshed_windows"] == 0
    assert stats2["interval_sampled_windows"] == 8
    assert stats2["sampled_windows"] == 40

    # Past the threshold: a warning, never an error.
    ring.sample(jax.random.PRNGKey(10), batch=8, minibatch=4, settings=None)
    with pytest.warns(UserWarning, match="reuse factor"):
        ring.take_stats(reuse_warn_factor=1.0)

    # Under the threshold (fresh push covers the samples): silent.
    ring.push(*_chunk(8))
    ring.push(*_chunk(12))
    ring.sample(jax.random.PRNGKey(11), batch=8, minibatch=4, settings=None)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        stats3 = ring.take_stats(reuse_warn_factor=2.0)
    assert stats3["reuse_factor"] == pytest.approx(1.0)


def test_loop_emits_ring_stats_in_step_hook(tmp_path):
    """The train loop surfaces ring telemetry through step_hook (and the
    same dict feeds the tensorboard scalars)."""
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel import make_mesh, shard_params
    from audio_to_midi_tpu.train import loop, setup_optimizers
    from tests.test_e2e import E2E_CFG

    cfg = dataclasses.replace(
        E2E_CFG,
        train=dataclasses.replace(
            E2E_CFG.train, num_steps=2, augment_on_device=True,
            input_ring_capacity=16, print_every=1,
        ),
    )
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    rng = np.random.default_rng(0)
    b, n = cfg.train.batch_size, cfg.data.samples_per_window

    def batches(num=2):
        for _ in range(num):
            audio = rng.standard_normal((b, 2, n)).astype(np.float32)
            labels = (rng.random((b, num_frames, 90)) > 0.95).astype(np.float32)
            yield labels, audio

    seen = []
    loop.train(
        cfg, params, state, tx, opt_state, batches(), None, sched, rope,
        num_frames, mesh=mesh,
        step_hook=lambda step, info: seen.append(info),
    )
    assert seen and all(info["ring"] is not None for info in seen)
    total_sampled = sum(i["ring"]["interval_sampled_windows"] for i in seen)
    assert total_sampled == len(seen) * cfg.train.batch_size
