"""Device-resident training input ring.

The reference feeds every training step a freshly host-assembled batch
(train.py:211-452 zip over the grain loader); on a TPU host — and especially
over a tunneled link — shipping ~47 MB of f32 windows per step serializes the
feed with the step and caps training at a fraction of the device step rate
(TRAINBENCH round 2: 1.6 steps/s vs 10.2 device-resident).

TPU-native redesign: the *pool* of training windows lives in HBM in f16 and
the per-step batch is sampled, augmented, and minibatched ON DEVICE — one
compiled gather+augment program whose inputs never cross the wire.  The host
refreshes ring slots asynchronously (device_put + donated
``dynamic_update_slice``) at whatever rate the link sustains; a slot is
reused (with fresh on-device augmentation, data/augment_device.py) until its
refresh lands, which is epoch-style sample reuse, not staleness of the
optimization state.

Wire format is f16: decoded audio is ALREADY f16-rounded (the reference's
decode dtype, python.rs:236-264), so the audio transfer is lossless; label
rasters lose <5e-4 absolute, far below the bf16 compute noise.

Why f16 and not something smaller: int8 audio would quantize the unit-variance
waveform to ~1/127 steps (audible artifacts at low gain after augmentation),
and the labels' decay envelope needs ~1e-3 resolution.
"""

from __future__ import annotations

import logging
import queue
import threading
from functools import partial
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _ring_write(ring: jax.Array, chunk: jax.Array, pos: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(
        ring, chunk, (pos,) + (jnp.int32(0),) * (ring.ndim - 1)
    )


@partial(jax.jit, static_argnames=("batch", "minibatch", "settings"))
def _sample_batch(
    audio_ring: jax.Array,
    labels_ring: jax.Array,
    filled: jax.Array,
    key: jax.Array,
    batch: int,
    minibatch: int,
    settings,
) -> tuple[jax.Array, jax.Array]:
    """Gather a batch off the ring, augment on device, minibatch-reshape.

    Sampling is uniform-with-replacement over the ``filled`` prefix (the
    reference's per-worker name permutation is approximated by uniform
    sampling from the resident pool; with continuous refresh the long-run
    visit distribution is uniform over the dataset either way).
    """
    k_idx, k_aug = jax.random.split(key)
    idx = jax.random.randint(k_idx, (batch,), 0, jnp.maximum(filled, 1))
    audio = audio_ring[idx].astype(jnp.float32)
    labels = labels_ring[idx].astype(jnp.float32)
    if settings is not None:
        from .augment_device import transform_for_training_device

        audio, labels = transform_for_training_device(audio, labels, settings, k_aug)
    audio_mb = audio.reshape(batch // minibatch, minibatch, *audio.shape[1:])
    labels_mb = labels.reshape(batch // minibatch, minibatch, *labels.shape[1:])
    return audio_mb, labels_mb


class _Feeder:
    """Background thread pulling host batches off a (possibly blocking)
    iterable, converting to f16 and dispatching the host->device transfer
    (``jax.device_put``) INSIDE the thread — on slow links (the 45 MB/s
    tunnel) the transfer itself is the feed bottleneck and must overlap the
    main thread's step dispatch, which it does here because the copy releases
    the GIL.  The queue carries device arrays; the main thread only issues
    the (cheap, donated) ring writes."""

    _DONE = object()

    def __init__(self, source: Iterable, depth: int = 2, to_device: bool = True):
        # ``to_device=False`` keeps chunks as host numpy (multi-host mode:
        # the ring assembles each host's LOCAL shard into a global sharded
        # array itself, so a premature single-device put would be wasted).
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._to_device = to_device
        self._thread = threading.Thread(target=self._run, args=(source,), daemon=True)
        self._done = False
        self._error: Optional[BaseException] = None
        self._thread.start()

    def _run(self, source):
        import jax

        nonfinite_streak = 0
        try:
            for events, audio in source:
                audio_np = np.ascontiguousarray(np.asarray(audio), dtype=np.float16)
                events_np = np.ascontiguousarray(np.asarray(events), dtype=np.float16)
                # A non-finite window (corrupt float-WAV payload, decoder bug)
                # must NOT enter the pool: ring slots are RESAMPLED for many
                # steps, so one NaN window would poison every later batch —
                # unlike the per-step feed, where the in-step guard skips one
                # update and moves on.  Skip the chunk, loudly — but a source
                # producing ONLY garbage must abort training fast (the pull
                # side would otherwise block its full stall budget waiting on
                # chunks that never arrive).
                if not (
                    np.isfinite(audio_np).all() and np.isfinite(events_np).all()
                ):
                    nonfinite_streak += 1
                    if nonfinite_streak >= 8:
                        raise RuntimeError(
                            "input source produced 8 non-finite feed chunks in "
                            "a row — corrupt dataset or broken decoder"
                        )
                    logging.getLogger(__name__).warning(
                        "dropping feed chunk with non-finite values "
                        "(corrupt input?) — not admitting it to the ring pool"
                    )
                    continue
                nonfinite_streak = 0
                if self._to_device:
                    audio_dev = jax.device_put(audio_np)
                    events_dev = jax.device_put(events_np)
                    # Block in THIS thread so queue depth reflects data
                    # actually on device, and the main thread never waits on
                    # a transfer.
                    jax.block_until_ready((audio_dev, events_dev))
                    self._q.put((audio_dev, events_dev))
                else:
                    self._q.put((audio_np, events_np))
        except BaseException as e:  # propagate to the training thread
            self._error = e
        finally:
            self._q.put(self._DONE)

    def get(self, block: bool) -> Optional[tuple[np.ndarray, np.ndarray]]:
        """Next (audio_f16, labels_f16) chunk, or None.  None means either
        "nothing ready" (non-blocking) or "source exhausted".  A data-source
        or transfer exception raised in the feeder thread re-raises HERE —
        a crashed loader must abort training, not freeze the ring pool."""
        if self._done:
            self._raise_if_failed()
            return None
        try:
            item = self._q.get(block=block, timeout=None if not block else 600)
        except queue.Empty:
            return None
        if item is self._DONE:
            self._done = True
            self._raise_if_failed()
            return None
        return item

    def _raise_if_failed(self) -> None:
        if self._error is not None:
            raise RuntimeError(
                "training input feed thread failed"
            ) from self._error

    @property
    def exhausted(self) -> bool:
        return self._done


class DeviceInputRing:
    """HBM-resident window pool + asynchronous host refresh.

    ``capacity`` is rounded up to a multiple of the feed chunk size so a
    refresh never wraps (single compiled update shape per array).
    """

    def __init__(
        self,
        capacity: int,
        chunk_windows: int,
        audio_shape: Optional[tuple[int, ...]] = None,
        label_shape: Optional[tuple[int, ...]] = None,
        dtype=jnp.float16,
        mesh=None,
    ):
        """``mesh`` switches the ring to multi-host (global-SPMD) mode: the
        pool lives REPLICATED on the mesh (sampling's random gather stays
        device-local), every process contributes its LOCAL shard of each
        ``chunk_windows``-window feed chunk (assembled with
        ``make_array_from_process_local_data``, sharded over "data"), and
        writes/samples run as multi-controller jit programs — so they MUST
        stay in lockstep across processes (use :meth:`pull_lockstep`, never
        :meth:`pull`, when a mesh is set)."""
        self.chunk = chunk_windows
        self.capacity = -(-capacity // chunk_windows) * chunk_windows
        self.dtype = dtype
        self._mesh = mesh
        self._samplers: dict = {}
        if mesh is not None:
            import jax as _jax

            self._world = _jax.process_count()
            if chunk_windows % self._world:
                raise ValueError(
                    f"chunk of {chunk_windows} windows does not divide over "
                    f"{self._world} processes"
                )
        else:
            self._world = 1
        # Window shapes come from the first feed chunk when not given — the
        # feed is the source of truth (tests/tools feed shapes that differ
        # from the config's production geometry).
        self._audio = (
            jnp.zeros((self.capacity, *audio_shape), dtype)
            if audio_shape is not None
            else None
        )
        self._labels = (
            jnp.zeros((self.capacity, *label_shape), dtype)
            if label_shape is not None
            else None
        )
        self._write = 0
        self.filled = 0
        self.pushed_windows = 0
        self.sampled_windows = 0
        # Interval counters for take_stats() (reuse telemetry).
        self._interval_pushed = 0
        self._interval_sampled = 0

    def _to_global_chunk(self, audio_np: np.ndarray, labels_np: np.ndarray):
        """Assemble per-process LOCAL chunk shards into global arrays sharded
        over "data" (dim 0) — each host only uploads its own windows."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        spec = NamedSharding(self._mesh, P(DATA_AXIS))
        return (
            _jax.make_array_from_process_local_data(spec, np.asarray(audio_np)),
            _jax.make_array_from_process_local_data(spec, np.asarray(labels_np)),
        )

    def _alloc(self, audio_shape, label_shape) -> None:
        self._audio = jnp.zeros((self.capacity, *audio_shape), self.dtype)
        self._labels = jnp.zeros((self.capacity, *label_shape), self.dtype)
        if self._mesh is not None:
            # Replicate the pool over the mesh: the per-step random gather
            # stays device-local; only the (rare) refresh chunk crosses links.
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            self._audio = _jax.device_put(self._audio, rep)
            self._labels = _jax.device_put(self._labels, rep)

    def push(self, audio_np: np.ndarray, labels_np: np.ndarray) -> None:
        """Dispatch an async transfer + ring write of one feed chunk.

        In mesh (multi-host) mode ``audio_np``/``labels_np`` are this
        process's LOCAL shard (chunk/world windows) and every process must
        call push in lockstep."""
        w = audio_np.shape[0] * self._world
        assert w == self.chunk, (w, self.chunk)
        if self._audio is None:
            self._alloc(audio_np.shape[1:], labels_np.shape[1:])
        pos = jnp.int32(self._write)
        if self._mesh is not None:
            audio_dev, labels_dev = self._to_global_chunk(audio_np, labels_np)
        else:
            audio_dev, labels_dev = jnp.asarray(audio_np), jnp.asarray(labels_np)
        self._audio = _ring_write(self._audio, audio_dev, pos)
        self._labels = _ring_write(self._labels, labels_dev, pos)
        self._write = (self._write + w) % self.capacity
        self.filled = min(self.filled + w, self.capacity)
        self.pushed_windows += w
        self._interval_pushed += w

    def pull(self, feeder: _Feeder, *, min_fill: int, max_chunks: int | None = None) -> None:
        """Drain whatever the feeder has ready (non-blocking); block only
        while the ring holds fewer than ``min_fill`` windows.  ``max_chunks``
        caps non-blocking refresh per call — on bandwidth-starved links
        (tunneled chips) refresh competes with step dispatch for the wire, so
        the train loop throttles it (TrainConfig.input_ring_refresh_period)."""
        taken = 0
        stalls = 0
        undersized_streak = 0
        while True:
            need = self.filled < min_fill
            if need and feeder.exhausted:
                if self.filled == 0:
                    raise RuntimeError("data source exhausted before any batch")
                return
            if not need and max_chunks is not None and taken >= max_chunks:
                return
            item = feeder.get(block=need)
            if item is None:
                if need:
                    # Blocking get hit the DONE sentinel or its 600 s timeout:
                    # loop back so the exhausted check above decides — but a
                    # live source that never produces must fail loudly, not
                    # spin here forever.
                    stalls += 1
                    if stalls >= 3 and not feeder.exhausted:
                        raise RuntimeError(
                            "training input feed produced nothing for "
                            f"~{stalls * 600} s while the ring needs data "
                            f"({self.filled}/{min_fill} windows) — stuck "
                            "loader/decoder?"
                        )
                    continue
                return
            stalls = 0
            taken += 1
            audio_np, labels_np = item
            if audio_np.shape[0] < self.chunk:
                # One trailing partial chunk (finite sources) is dropped to
                # keep a single compiled update shape; the FIRST chunk or two
                # undersized chunks in a row mean the source's batch size is
                # smaller than the ring chunk — pushing nothing forever would
                # spin the blocking fill loop through the whole dataset.
                undersized_streak += 1
                if self.pushed_windows == 0 or undersized_streak >= 2:
                    raise ValueError(
                        f"feed chunks carry {audio_np.shape[0]} windows but the "
                        f"ring updates in chunks of {self.chunk}: the data "
                        "loader's batch size must be >= the training batch size "
                        "(smaller chunks are dropped and the ring would never "
                        "refresh)"
                    )
                continue
            undersized_streak = 0
            # Split oversized feed chunks; any trailing partial is dropped
            # (same single-update-shape rule as above).
            for lo in range(0, audio_np.shape[0] - self.chunk + 1, self.chunk):
                self.push(
                    audio_np[lo : lo + self.chunk], labels_np[lo : lo + self.chunk]
                )

    def pull_lockstep(
        self, feeder: _Feeder, *, min_fill: int, refresh_chunks: int
    ) -> None:
        """Deterministic multi-host refresh: every process takes EXACTLY the
        same number of chunks per call (blocking), so ring state and the
        global write/sample programs stay in lockstep across processes.

        The opportunistic :meth:`pull` (drain whatever is ready) is
        host-timing-dependent — two hosts would diverge on how many chunks
        landed and every subsequent collective would deadlock.  Here the
        only discipline is: block until ``min_fill`` during the initial
        fill, then block for ``refresh_chunks`` whole chunks per call.
        Multi-host feeders MUST produce the same number of chunks on every
        process (true by construction for evenly-partitioned datasets and
        for infinite production loaders) — exhaustion must be simultaneous."""
        local_chunk = self.chunk // self._world
        target = refresh_chunks
        while self.filled < min_fill or target > 0:
            item = feeder.get(block=True)
            if item is None:
                # Exhausted (or 600 s timeout -> loop-wide stall handling is
                # the single-host pull's job; multi-host favours fail-fast).
                if feeder.exhausted:
                    if self.filled == 0:
                        raise RuntimeError("data source exhausted before any batch")
                    return
                raise RuntimeError(
                    "multi-host training input feed produced nothing for "
                    f"~600 s ({self.filled}/{min_fill} windows) — stuck "
                    "loader/decoder?"
                )
            audio_np, labels_np = item
            if audio_np.shape[0] < local_chunk:
                raise ValueError(
                    f"feed chunks carry {audio_np.shape[0]} local windows but "
                    f"the multi-host ring updates in local chunks of "
                    f"{local_chunk}: the per-process loader batch must be >= "
                    "batch_size // process_count"
                )
            pushed = False
            for lo in range(0, audio_np.shape[0] - local_chunk + 1, local_chunk):
                self.push(
                    audio_np[lo : lo + local_chunk],
                    labels_np[lo : lo + local_chunk],
                )
                pushed = True
            if pushed:
                target -= 1

    def _sampler_for(self, batch: int, minibatch: int, settings):
        """Mesh mode: a cached jit whose outputs are sharded (None, "data")
        — exactly the train step's in_shardings, so no implicit reshard (and
        no committed-sharding mismatch) between sampling and the step."""
        cache_key = (batch, minibatch, settings)
        fn = self._samplers.get(cache_key)
        if fn is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            out_spec = NamedSharding(self._mesh, P(None, DATA_AXIS))
            fn = jax.jit(
                partial(
                    _sample_batch.__wrapped__,
                    batch=batch, minibatch=minibatch, settings=settings,
                ),
                out_shardings=(out_spec, out_spec),
            )
            self._samplers[cache_key] = fn
        return fn

    def sample(self, key: jax.Array, batch: int, minibatch: int, settings):
        self.sampled_windows += batch
        self._interval_sampled += batch
        if self._mesh is not None:
            return self._sampler_for(batch, minibatch, settings)(
                self._audio, self._labels, jnp.int32(self.filled), key
            )
        return _sample_batch(
            self._audio,
            self._labels,
            jnp.int32(self.filled),
            key,
            batch,
            minibatch,
            settings,
        )

    def take_stats(self, reuse_warn_factor: Optional[float] = None) -> dict:
        """Reuse/refresh telemetry since the previous call (and lifetime).

        ``reuse_factor`` is windows *sampled* per window *refreshed* over the
        interval — 1.0 means every consumed window was freshly fed (the
        reference's per-step feed shape); large values mean epoch-style slot
        reuse because the host/link cannot keep up with the device
        (data/device_ring.py module docstring).  Reuse is a designed-in
        degradation, not a failure — but it must be VISIBLE: past
        ``reuse_warn_factor`` a warning is emitted (never an error; stall
        *failure* is detected separately in :meth:`pull`)."""
        interval_pushed = self._interval_pushed
        interval_sampled = self._interval_sampled
        self._interval_pushed = 0
        self._interval_sampled = 0
        reuse = interval_sampled / max(interval_pushed, 1)
        stats = {
            "filled": self.filled,
            "capacity": self.capacity,
            "pushed_windows": self.pushed_windows,
            "sampled_windows": self.sampled_windows,
            "interval_refreshed_windows": interval_pushed,
            "interval_sampled_windows": interval_sampled,
            "reuse_factor": reuse,
        }
        if (
            reuse_warn_factor is not None
            and interval_sampled > 0
            and reuse > reuse_warn_factor
        ):
            import warnings

            warnings.warn(
                f"input ring reuse factor {reuse:.1f} exceeds "
                f"{reuse_warn_factor:.1f} (sampled {interval_sampled} windows "
                f"while refreshing {interval_pushed}): the feed is starved and "
                "training is re-seeing resident windows epoch-style — raise "
                "loader workers/link bandwidth or accept the sample reuse",
                stacklevel=2,
            )
        return stats


def ring_feed(
    data_loader: Iterable,
    *,
    capacity: int,
    chunk_windows: int,
    audio_shape: tuple[int, ...],
    label_shape: tuple[int, ...],
) -> tuple[DeviceInputRing, _Feeder]:
    ring = DeviceInputRing(capacity, chunk_windows, audio_shape, label_shape)
    return ring, _Feeder(data_loader)
