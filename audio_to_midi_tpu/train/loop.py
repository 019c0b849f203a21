"""The training loop: loss-scaling state machine, NaN rollback, checkpoints,
tensorboard metrics, test-set eval, ensemble evolution.

Reference semantics (train.py:211-452):
  * host snapshot of (params, opt_state) every ``recovery_snapshot_every``
    steps; on non-finite grads/loss -> halve the grad scale and roll back;
  * double the grad scale whenever the scaled loss drops below 10k;
  * orbax save on ``should_save``; train/loss (min over ensemble) and LR
    scalars every ``print_every``; per-testset loss/hit-rate/eventized-diff +
    figures every ``testset_loss_every``; genetic recombination after eval.

With the bf16 policy (TPU default) the grad scale is pinned at 1.0 — the
machinery stays wired for the f16 parity policy.
"""

from __future__ import annotations

import logging
import time
import warnings
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.rope import RopeFreqs
from ..parallel.mesh import make_mesh, make_param_placer, tp_active
from . import checkpoint as ckpt
from .ensemble import evolve_model_ensemble
from .evaluate import compute_testset_loss
from .step import make_train_step, reshape_to_minibatches

log = logging.getLogger(__name__)


def _copy_to_host(tree):
    return jax.tree.map(lambda x: np.array(x), tree)


def train(
    cfg: Config,
    params,
    state,
    tx,
    opt_state,
    data_loader: Iterable,
    checkpoint_manager,
    learning_rate_schedule: Callable,
    rope: RopeFreqs,
    num_model_output_frames: int,
    testset_dirs: Optional[dict[str, Path]] = None,
    summary_writer=None,
    mesh=None,
    num_steps: Optional[int] = None,
    key: Optional[jax.Array] = None,
    step_hook: Optional[Callable[[int, dict[str, Any]], None]] = None,
):
    """Run the training loop.  ``params``/``opt_state`` carry a leading
    ensemble axis.  Returns (params, state, opt_state).

    Multi-host (``jax.distributed`` initialized, process_count > 1): each
    process's ``data_loader`` yields its LOCAL shard of every batch
    (``batch_size // process_count`` samples) and the loop assembles global
    data-sharded arrays per step; the device input ring stays ON, running in
    global-SPMD lockstep mode (replicated pool, per-host chunk shards,
    blocking refresh — data/device_ring.py).  Checkpointing and test-set
    eval in multi-host runs need
    every process to participate with identical testset data — pass
    ``checkpoint_manager=None``/no ``testset_dirs`` from secondary processes
    unless your storage is shared (orbax handles coordination when it is)."""
    testset_dirs = testset_dirs or {}
    num_steps = num_steps or cfg.train.num_steps
    key = key if key is not None else jax.random.PRNGKey(cfg.train.seed)
    if mesh is None:
        mesh = make_mesh(
            cfg.train.ensemble_size, model_size=cfg.train.model_parallel_size
        )
    # One placement rule for every (re-)placement site: rollback restore and
    # evolution re-shard keep the TP layout when the mesh has a model axis.
    place_params = make_param_placer(mesh, cfg.model.num_transformer_heads)
    from ..parallel import tp as tp_mod

    if tp_active(mesh) and cfg.model.attention_impl in ("pallas", "pallas_rw"):
        # TP keeps the Pallas kernels (VERDICT r04 #7): heads are shard-local
        # under the head-split rule (parallel/tp.py), so models/attention
        # wraps each attention core in a shard_map manual over the "model"
        # axis — every shard runs the fused kernel on its own heads; the
        # all-reduce stays at the out-projection.  The XLA einsum fallback
        # (+16.2 ms/step, PERF.md dead ends) is no longer forced.
        tp_mod.set_tp_attention_mesh(mesh)
        log.info(
            "model axis %d active: head-sharded Pallas attention via shard_map",
            mesh.shape["model"],
        )
    else:
        tp_mod.set_tp_attention_mesh(None)
        if tp_active(mesh) and cfg.model.attention_impl != "xla":
            # The megakernel impls (pallas_block/pair/fused) close over the
            # WEIGHTS inside the kernel, so head-sharding does not apply;
            # GSPMD TP needs the einsum formulation for those.
            import dataclasses

            log.info(
                'model axis %d active: forcing attention_impl="xla" for '
                "GSPMD TP (megakernel impl %s is not head-shardable)",
                mesh.shape["model"], cfg.model.attention_impl,
            )
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, attention_impl="xla")
            )

    train_step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)

    # Optional on-device augmentation: the loader feeds RAW cached windows
    # and the nine reference transforms (python.rs:566-932) run as one jitted
    # TPU program per batch — the single-core host stops being the
    # bottleneck (TRAINBENCH: host-side augment capped the loader path at
    # ~1.3 steps/s where the device step sustains ~10).
    device_augment = None
    if cfg.train.augment_on_device and cfg.transforms is not None:
        from ..data.augment_device import transform_for_training_device

        device_augment = jax.jit(
            lambda a, e, k: transform_for_training_device(a, e, cfg.transforms, k)
        )

    start_step = (
        checkpoint_manager.latest_step() + 1
        if checkpoint_manager is not None and checkpoint_manager.latest_step() is not None
        else 1
    )

    minibatch = cfg.train.minibatch_size_per_device * max(
        1, mesh.shape["data"] if mesh is not None else 1
    )
    # Clamp for tiny batches (tests / debug runs): one accumulation step.
    minibatch = min(minibatch, cfg.train.batch_size)

    grad_scale = 1.0
    use_loss_scaling = cfg.precision.needs_loss_scaling
    recovery = (_copy_to_host(params), _copy_to_host(opt_state))
    # Loss accumulates ON DEVICE; the host syncs on the PREVIOUS step's loss
    # each iteration — keeping one step in flight (overlap) while bounding the
    # dispatch queue (an unbounded async queue of per-step input transfers
    # backlogs the runtime and grows host memory without bound).
    loss_sum = jnp.zeros((cfg.train.ensemble_size,), jnp.float32)
    loss_count = 0
    prev_loss = None
    t_start = time.time()
    step = start_step - 1

    # Feed path.  Default: device-resident input ring (data/device_ring.py) —
    # the window pool lives in HBM as f16, batches are sampled + augmented on
    # device, and the host refreshes ring slots asynchronously; per-step wire
    # traffic is zero.  The ring is disabled when the loader augments on the
    # host (a host-augmented window must not be reused with the same
    # augmentation) or when input_ring_capacity == 0, falling back to
    # per-step host batches (the reference's feed shape, train.py:345).
    batch_size = cfg.train.batch_size
    # A loader built with transform_settings augments on the HOST regardless
    # of cfg.train.augment_on_device (callers following the pre-ring pattern
    # ThreadedBatchLoader(..., transform_settings=cfg.transforms) with the
    # augment_on_device default now True): trust the loader over the config
    # so such a feed is never double-augmented or ring-reused.
    loader_host_augments = getattr(data_loader, "transform_settings", None) is not None
    if loader_host_augments and device_augment is not None:
        warnings.warn(
            "data_loader was built with transform_settings (host augmentation) "
            "but cfg.train.augment_on_device is True; disabling on-device "
            "augmentation and the input ring for this run. Build the loader "
            "with transform_settings=None to use the fast device-augmented "
            "ring feed.",
            stacklevel=2,
        )
        device_augment = None
    host_augmented_feed = loader_host_augments or (
        cfg.transforms is not None and not cfg.train.augment_on_device
    )
    # Multi-host (jax.distributed): each process's data_loader yields its
    # LOCAL shard (batch_size // process_count samples per step) and the loop
    # assembles global device arrays (make_array_from_process_local_data) —
    # the reference shards data across devices the same way (README.md:59).
    # The device ring runs in global-SPMD mode across processes: a replicated
    # pool, per-host chunk shards, and a LOCKSTEP refresh discipline
    # (DeviceInputRing.pull_lockstep) so ring state never diverges between
    # hosts.
    multihost = jax.process_count() > 1
    use_ring = cfg.train.input_ring_capacity > 0 and not host_augmented_feed
    ring_settings = cfg.transforms if device_augment is not None else None
    if multihost:
        from ..parallel.mesh import host_local_batch_to_global

        if batch_size % jax.process_count() or minibatch % jax.process_count():
            raise ValueError(
                f"batch_size {batch_size} and minibatch {minibatch} must both "
                f"divide over {jax.process_count()} processes"
            )
        local_minibatch = minibatch // jax.process_count()

        def _augment_minibatched(a, e, k):
            # (accum, mb, ...) global arrays -> flat batch -> augment -> back.
            acc, mb = a.shape[0], a.shape[1]
            a2 = a.reshape(acc * mb, *a.shape[2:]).astype(jnp.float32)
            e2 = e.reshape(acc * mb, *e.shape[2:]).astype(jnp.float32)
            a2, e2 = device_augment(a2, e2, k)
            return (
                a2.reshape(acc, mb, *a2.shape[1:]),
                e2.reshape(acc, mb, *e2.shape[1:]),
            )

        augment_minibatched = jax.jit(_augment_minibatched)
    data_iter = iter(data_loader)
    if use_ring:
        from ..data.device_ring import DeviceInputRing, _Feeder

        # Window shapes come from the first feed chunk (the feed is the
        # source of truth; tests/tools feed non-production geometries).
        ring = DeviceInputRing(
            cfg.train.input_ring_capacity, batch_size,
            mesh=mesh if multihost else None,
        )
        feeder = _Feeder(data_iter, to_device=not multihost)
        min_fill = min(batch_size, ring.capacity)

    for step in range(start_step, num_steps + 1):
        key, step_key = jax.random.split(key)

        if use_ring:
            refresh = step % max(cfg.train.input_ring_refresh_period, 1) == 0
            if multihost:
                ring.pull_lockstep(
                    feeder, min_fill=min_fill, refresh_chunks=1 if refresh else 0
                )
            else:
                ring.pull(
                    feeder, min_fill=min_fill, max_chunks=1 if refresh else 0
                )
            key, sample_key = jax.random.split(key)
            audio_mb, events_mb = ring.sample(
                sample_key, batch_size, minibatch, ring_settings
            )
        else:
            try:
                events, audio = next(data_iter)
            except StopIteration:
                step -= 1  # no step ran for this iteration
                break
            if multihost:
                # Local shard -> (accum, local_mb, ...) -> global minibatches
                # sharded over "data"; augmentation (if on) runs as ONE global
                # SPMD program (same key on every process => same program).
                wire = np.float16 if device_augment is not None else np.float32
                audio_mb = host_local_batch_to_global(
                    reshape_to_minibatches(
                        np.asarray(audio, dtype=wire), local_minibatch
                    ),
                    mesh, leading_axes=1,
                )
                events_mb = host_local_batch_to_global(
                    reshape_to_minibatches(
                        np.asarray(events, dtype=wire), local_minibatch
                    ),
                    mesh, leading_axes=1,
                )
                if device_augment is not None:
                    key, aug_key = jax.random.split(key)
                    audio_mb, events_mb = augment_minibatched(
                        audio_mb, events_mb, aug_key
                    )
            elif device_augment is not None:
                # Ship the wire as f16: decoded audio is already f16-rounded
                # (python.rs:236-264), so the transfer is lossless — and half
                # the bytes of f32 on transfer-bound links.
                audio = jnp.asarray(np.asarray(audio, dtype=np.float16))
                events = jnp.asarray(np.asarray(events, dtype=np.float16))
                key, aug_key = jax.random.split(key)
                audio, events = device_augment(
                    audio.astype(jnp.float32), events.astype(jnp.float32), aug_key
                )
            else:
                audio = jnp.asarray(audio)
                events = jnp.asarray(events)
            if not multihost:
                audio_mb = reshape_to_minibatches(audio, minibatch)
                events_mb = reshape_to_minibatches(events, minibatch)

        if use_loss_scaling and step % cfg.train.recovery_snapshot_every == 0:
            recovery = (_copy_to_host(params), _copy_to_host(opt_state))

        out = train_step(
            params, opt_state, audio_mb, events_mb, step_key,
            jnp.asarray(grad_scale, cfg.precision.compute_dtype),
        )
        loss, params, opt_state = out.loss, out.params, out.opt_state

        if prev_loss is not None:
            jax.block_until_ready(prev_loss)
            # The guard inside the step already skipped the bad update
            # device-side (step.py); here we just surface it.  Checked one
            # step late so the bf16 default keeps one step in flight.
            prev_valid_host = np.asarray(prev_valid)
            if not prev_valid_host.all():
                log.warning(
                    "Non-finite grads/loss at step %d (members valid=%s); "
                    "update was skipped for the affected members",
                    step - 1, prev_valid_host,
                )
        prev_loss, prev_valid = loss, out.grads_valid

        if use_loss_scaling:
            grads_valid = np.all(np.asarray(out.grads_valid))
            loss_host = np.asarray(loss)
            if not grads_valid or not np.all(np.isfinite(loss_host)):
                new_scale = grad_scale / 2
                log.warning(
                    "Non-finite grads/loss at step %d; rolling back, grad scale %s -> %s",
                    step, grad_scale, new_scale,
                )
                grad_scale = new_scale
                ens = cfg.train.ensemble_size > 1
                params = place_params(recovery[0], ensemble=ens)
                opt_state = place_params(recovery[1], ensemble=ens)
                # This step was rolled back to the snapshot, not merely
                # skipped — clear the lagged guard so the next iteration
                # doesn't log a second, misattributed "update was skipped"
                # warning for the same event.
                prev_loss, prev_valid = None, None
                continue
            if np.all(np.asarray(out.scaled_loss) < cfg.train.loss_scale_increase_threshold):
                grad_scale = grad_scale * 2

        if checkpoint_manager is not None:
            ckpt.save_checkpoint(checkpoint_manager, step, params, state)

        # Mask non-finite member losses out of the running average (the
        # corresponding updates were skipped by the in-step guard).
        loss_sum = loss_sum + jnp.where(jnp.isfinite(loss), loss, 0.0)
        loss_count += 1

        if step % cfg.train.print_every == 0:
            averaged = np.asarray(loss_sum, np.float64) / max(loss_count, 1)
            lr = float(learning_rate_schedule(step))
            steps_per_s = loss_count / max(time.time() - t_start, 1e-9)
            log.info(
                "step %d/%d loss=%s lr=%.3g steps/s=%.2f",
                step, num_steps, averaged, lr, steps_per_s,
            )
            ring_stats = (
                ring.take_stats(cfg.train.input_ring_reuse_warn_factor)
                if use_ring
                else None
            )
            if summary_writer is not None:
                summary_writer.add_scalar("train/loss", float(np.min(averaged)), step)
                summary_writer.add_scalar("train/learning_rate", lr, step)
                summary_writer.add_scalar("train/steps_per_sec", steps_per_s, step)
                if ring_stats is not None:
                    # Reuse/refresh visibility (VERDICT r03: silent reuse
                    # degradation): 1.0 = every window fresh; large = starved
                    # feed re-serving resident windows.
                    summary_writer.add_scalar(
                        "train/ring_reuse_factor", ring_stats["reuse_factor"], step
                    )
                    summary_writer.add_scalar(
                        "train/ring_refreshed_windows",
                        ring_stats["interval_refreshed_windows"], step,
                    )
                    summary_writer.add_scalar(
                        "train/ring_filled", ring_stats["filled"], step
                    )
                summary_writer.flush()
            if step_hook is not None:
                step_hook(
                    step,
                    {
                        "loss": averaged,
                        "lr": lr,
                        "steps_per_s": steps_per_s,
                        "grad_scale": grad_scale,
                        "ring": ring_stats,
                    },
                )
            loss_sum = jnp.zeros_like(loss_sum)
            loss_count = 0
            t_start = time.time()

        if testset_dirs and step % cfg.train.testset_loss_every == 0:
            testset_losses = []
            for name, testset_dir in testset_dirs.items():
                test_loss, hit_rate, eventized_diff, figs = compute_testset_loss(
                    params, cfg, testset_dir, num_model_output_frames, rope
                )
                log.info(
                    "testset %s: loss=%s hit_rate=%s eventized_diff=%s",
                    name, test_loss, hit_rate, eventized_diff,
                )
                testset_losses.append(test_loss)
                if summary_writer is not None:
                    summary_writer.add_scalar(
                        f"train/test-loss-{name}", float(test_loss[0]), step
                    )
                    # Beyond the reference (which only wrote the loss scalar,
                    # train.py:434-436): the two headline metrics as scalars.
                    summary_writer.add_scalar(
                        f"train/test-hit-rate-{name}", float(hit_rate[0]), step
                    )
                    summary_writer.add_scalar(
                        f"train/test-eventized-diff-{name}",
                        float(eventized_diff[0]), step,
                    )
                    for i, fig in enumerate(figs):
                        summary_writer.add_figure(f"train/test-loss-{name}-{i}", fig, step)
                if figs:
                    # add_figure rendered them; release pyplot's references
                    # (unbounded open figures leak host memory on long runs).
                    import matplotlib.pyplot as plt

                    for fig in figs:
                        plt.close(fig)
            if summary_writer is not None:
                summary_writer.flush()

            if cfg.train.ensemble_size > 2:
                scores = np.mean(np.stack(testset_losses), axis=0)
                # Single-use key discipline: split first, then seed numpy
                # with the subkey's full raw data (64 bits of entropy, not a
                # single uint32 draw from the still-live key).
                key, evolve_key = jax.random.split(key)
                if jnp.issubdtype(evolve_key.dtype, jax.dtypes.prng_key):
                    seed_words = np.asarray(jax.random.key_data(evolve_key))
                else:
                    seed_words = np.asarray(evolve_key)
                rng = np.random.default_rng([int(w) for w in seed_words.ravel()])
                evolved = evolve_model_ensemble(params, scores, rng)
                # Re-place with the population axis still sharded over the
                # mesh "ensemble" dim (the rollback path at the top of the
                # loop does the same) — dropping it would silently replicate
                # params and double per-device memory on an ensemble mesh.
                params = place_params(
                    evolved, ensemble=cfg.train.ensemble_size > 1
                )
                # Optimizer state is deliberately KEPT across recombination:
                # the reference leaves this as an open TODO (train.py:440-442)
                # and in practice never resets; a recombined member inherits
                # the moments of the slot it replaced, which re-converge
                # within ~beta2 horizon and avoid a cold-start LR spike.

    # Final save so short runs (< save interval) still leave a usable
    # checkpoint; skipped if the last step already saved or no step ran.
    if checkpoint_manager is not None and step >= start_step:
        if checkpoint_manager.latest_step() != step:
            ckpt.save_checkpoint(checkpoint_manager, step, params, state, force=True)

    return params, state, opt_state
