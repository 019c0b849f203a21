"""Training runtime tests on an 8-device virtual CPU mesh: sharded train
step, loss decrease, optimizer label routing, loss-scaling rollback wiring,
checkpointing, ensemble evolution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import Config, ModelConfig, PrecisionConfig, TrainConfig
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.parallel import make_mesh, shard_params, batch_spec
from audio_to_midi_tpu.train import (
    checkpoint as ckpt,
    evolve_model_ensemble,
    make_train_step,
    optim,
    reshape_to_minibatches,
    setup_optimizers,
)

SMALL_MODEL = ModelConfig(
    dims=(4, 8),
    depths=(1, 1),
    num_transformer_layers=1,
    num_transformer_heads=2,
    attention_size=8,
    compressed_attention_kv_size=8,
    compressed_attention_q_size=8,
)


def small_config(**train_kwargs) -> Config:
    train = TrainConfig(
        batch_size=8, minibatch_size_per_device=1, num_steps=50, warmup_steps=5,
        **train_kwargs,
    )
    return Config(
        model=SMALL_MODEL,
        train=train,
        precision=PrecisionConfig(compute_dtype=jnp.float32),
    )


def _data(b=8, n=200, f=20, seed=0):  # n=200 -> stem/5, /2 -> 20 frames
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, 2, n)).astype(np.float32)
    labels = (rng.random((b, f, 90)) > 0.9).astype(np.float32)
    return audio, labels


def test_train_step_runs_sharded_and_loss_decreases():
    assert len(jax.devices()) == 8
    cfg = small_config()
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
    audio, labels = _data()
    audio_mb = jax.device_put(
        reshape_to_minibatches(jnp.asarray(audio), 8), batch_spec(mesh, 1)
    )
    labels_mb = jax.device_put(
        reshape_to_minibatches(jnp.asarray(labels), 8), batch_spec(mesh, 1)
    )

    losses = []
    key = jax.random.PRNGKey(1)
    scale = jnp.asarray(1.0, jnp.float32)
    for i in range(12):
        key, k = jax.random.split(key)
        out = step(params, opt_state, audio_mb, labels_mb, k, scale)
        params, opt_state = out.params, out.opt_state
        assert bool(out.grads_valid[0])
        losses.append(float(out.loss[0]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # overfits a fixed batch


def test_grad_accumulation_consistency():
    """2 minibatches of 4 should match 1 minibatch of 8 with dropout off."""
    cfg = dataclasses.replace(
        small_config(),
        model=dataclasses.replace(SMALL_MODEL, transformer_dropout_rate=0.0),
    )
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    step = make_train_step(cfg, tx, rope, mesh=None, ensemble=True)

    audio, labels = _data()
    key = jax.random.PRNGKey(2)
    scale = jnp.asarray(1.0, jnp.float32)

    out_a = step(
        params, opt_state,
        reshape_to_minibatches(jnp.asarray(audio), 4),
        reshape_to_minibatches(jnp.asarray(labels), 4),
        key, scale,
    )
    params2, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    opt_state2 = jax.vmap(tx.init)(params2)
    out_b = step(
        params2, opt_state2,
        reshape_to_minibatches(jnp.asarray(audio), 8),
        reshape_to_minibatches(jnp.asarray(labels), 8),
        key, scale,
    )
    np.testing.assert_allclose(
        float(out_a.loss[0]), float(out_b.loss[0]), rtol=1e-5
    )
    a_leaves = jax.tree.leaves(out_a.params)
    b_leaves = jax.tree.leaves(out_b.params)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_nan_grads_detected():
    cfg = small_config()
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    step = make_train_step(cfg, tx, rope, mesh=None, ensemble=True)
    audio, labels = _data()
    audio[0, 0, 0] = np.nan
    params0 = jax.tree.map(np.asarray, params)  # inputs are donated
    opt_state0 = jax.tree.map(np.asarray, opt_state)
    out = step(
        params, opt_state,
        reshape_to_minibatches(jnp.asarray(audio), 8),
        reshape_to_minibatches(jnp.asarray(labels), 8),
        jax.random.PRNGKey(0), jnp.asarray(1.0, jnp.float32),
    )
    assert not bool(out.grads_valid[0])
    # In-step guard (reference train.py:369-377 checks every step): the bad
    # update must NOT be applied — params and opt state come back unchanged.
    for new, old in zip(jax.tree.leaves(out.params), jax.tree.leaves(params0)):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    for new, old in zip(jax.tree.leaves(out.opt_state), jax.tree.leaves(opt_state0)):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))


def test_bf16_loop_skips_nonfinite_update(caplog, tmp_path):
    """bf16 (no loss scaling): a NaN batch must leave params untouched and
    log a warning — the reference always guards (train.py:369-377)."""
    import logging

    from audio_to_midi_tpu.train import loop

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg,
        precision=PrecisionConfig(compute_dtype=jnp.bfloat16),
        # Per-step feed: the ring feeder (rightly) refuses non-finite chunks,
        # so a poisoned batch would never reach the in-step guard under test.
        train=dataclasses.replace(
            cfg.train, num_steps=2, print_every=1, input_ring_capacity=0
        ),
    )
    assert not cfg.precision.needs_loss_scaling
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    mesh = make_mesh(1)
    params = shard_params(params, mesh)
    params0 = jax.tree.map(np.asarray, params)

    audio, labels = _data()
    audio[:, :, :] = np.nan  # every batch poisoned

    def batches():
        while True:
            yield labels, audio

    with caplog.at_level(logging.WARNING, logger="audio_to_midi_tpu.train.loop"):
        out_params, _, _ = loop.train(
            cfg, params, state, tx, opt_state, batches(), None, sched, rope,
            num_model_output_frames=20, mesh=mesh,
        )
    for new, old in zip(jax.tree.leaves(out_params), jax.tree.leaves(params0)):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    assert any("Non-finite grads/loss" in r.message for r in caplog.records)


def test_optimizer_depth_factors():
    """Layer-wise LR decay: decay ** (max_depth - depth) with the reference's
    Sequential depth counting (stem/downsample = prefix, block j = prefix+j+1)."""
    cfg = ModelConfig()  # full 7-stage config
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg)
    decay = 0.7
    factors = optim.lr_decay_factors(params, cfg, decay)
    max_depth = sum(cfg.depths)  # 39

    # stem of stage 0 -> depth 0
    np.testing.assert_allclose(
        factors["cnn"]["stages"][0]["down"]["conv"]["w"], decay ** max_depth
    )
    # stage 0 blocks (stacked leading axis): depths 1, 2, 3
    f0 = np.asarray(factors["cnn"]["stages"][0]["blocks"]["pw1"]["w"]).ravel()
    np.testing.assert_allclose(
        f0, [decay ** (max_depth - d) for d in (1, 2, 3)], rtol=1e-6
    )
    # stage 6 (prefix 36): down -> 36; blocks -> 37, 38, 39 (last factor 1.0)
    np.testing.assert_allclose(
        factors["cnn"]["stages"][6]["down"]["conv"]["w"], decay ** 3
    )
    f6 = np.asarray(factors["cnn"]["stages"][6]["blocks"]["gamma"]).ravel()
    np.testing.assert_allclose(f6, [decay**2, decay**1, 1.0], rtol=1e-6)
    # non-CNN params: no decay
    assert factors["transformer"]["local"]["attention"]["q_up"]["w"] == 1.0
    assert factors["decoder"]["out"]["w"] == 1.0


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_config()
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    mgr = ckpt.create_checkpoint_manager(tmp_path / "ckpt", cfg, save_interval_steps=1)
    assert ckpt.save_checkpoint(mgr, 1, params, state)
    mgr.wait_until_finished()
    assert ckpt.check_metadata(mgr, cfg)

    like = jax.tree.map(np.zeros_like, params)
    restored, rstate, step = ckpt.restore_checkpoint(mgr, like)
    assert step == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # metadata drift warning
    import dataclasses as dc
    other = dc.replace(cfg, model=dc.replace(cfg.model, num_transformer_heads=8))
    with pytest.warns(UserWarning, match="metadata mismatch"):
        assert not ckpt.check_metadata(mgr, other)


def test_ensemble_evolution():
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), SMALL_MODEL, 4)
    host = jax.tree.map(np.asarray, params)
    scores = np.array([1.0, 3.0, 0.5, 2.0])  # winners: idx 2, 0; losers: 3, 1
    evolved = evolve_model_ensemble(params, scores, np.random.default_rng(0))
    for before, after in zip(jax.tree.leaves(host), jax.tree.leaves(evolved)):
        np.testing.assert_array_equal(before[2], after[2])
        np.testing.assert_array_equal(before[0], after[0])
    changed = any(
        not np.array_equal(b[1], a[1]) or not np.array_equal(b[3], a[3])
        for b, a in zip(jax.tree.leaves(host), jax.tree.leaves(evolved))
    )
    assert changed


def test_evolution_crossleaf_run_stream():
    """Crossover is ONE geometric run-stream spanning every leaf of a child:
    the first run copies parent_a and a run crosses leaf boundaries
    (reference train.py:494-540 keeps recombination_steps/current_parent_idx
    as nonlocals shared by all recombine_leaf calls)."""

    class ScriptedRng:
        """Deterministic stand-in: geometric() pops scripted run lengths."""

        def __init__(self, runs):
            self.runs = list(runs)

        def geometric(self, _rate):
            return self.runs.pop(0) if self.runs else 10**9

        def choice(self, n, size, replace):
            return np.array([0, 1])

        def random(self, n):
            return np.ones(n)  # never below MUTATION_RATE -> no mutation

        def standard_normal(self, n):
            return np.zeros(n)

    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), SMALL_MODEL, 4)
    host = jax.tree.map(np.asarray, params)
    leaves = [
        l for l in jax.tree.leaves(host) if np.issubdtype(l.dtype, np.floating)
    ]
    total = sum(l[0].size for l in leaves)
    first_leaf = leaves[0][0].size
    # First run ends INSIDE the second leaf; second run covers the rest of
    # child 3; child 1 is a single parent_a run.
    cut = first_leaf + max(1, leaves[1][0].size // 2)
    rng = ScriptedRng([cut, total - cut, total])
    scores = np.array([1.0, 3.0, 0.5, 2.0])  # winners [2, 0]; losers [3, 1]
    evolved = evolve_model_ensemble(params, scores, rng)

    def flat(tree, member):
        return np.concatenate(
            [
                np.asarray(l[member]).ravel()
                for l in jax.tree.leaves(tree)
                if np.issubdtype(np.asarray(l).dtype, np.floating)
            ]
        )

    pa, pb = flat(host, 2), flat(host, 0)  # parent_a=2, parent_b=0
    child3 = flat(evolved, 3)
    np.testing.assert_array_equal(child3[:cut], pa[:cut])  # spans leaf 1->2
    np.testing.assert_array_equal(child3[cut:], pb[cut:])
    assert cut > first_leaf  # the boundary really falls inside leaf 2
    np.testing.assert_array_equal(flat(evolved, 1), pa)  # one full-run child


def test_evolution_skipped_for_small_population():
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), SMALL_MODEL, 2)
    out = evolve_model_ensemble(params, np.array([1.0, 2.0]), np.random.default_rng(0))
    assert out is params


def test_f16_loss_scaling_state_machine(caplog, tmp_path):
    """f16 policy end-to-end on CPU: a poisoned batch halves the grad scale
    and rolls params back to the last snapshot; clean batches below the
    increase threshold double it again (reference train.py:334-382)."""
    import logging

    from audio_to_midi_tpu.train import loop

    cfg = small_config(
        print_every=1, recovery_snapshot_every=1,
        loss_scale_increase_threshold=1e9,  # always double on a clean step
    )
    cfg = dataclasses.replace(
        cfg,
        precision=PrecisionConfig(compute_dtype=jnp.float16),
        # Per-step feed: the ring feeder (rightly) refuses non-finite chunks,
        # so the poisoned batch would never reach the step.
        train=dataclasses.replace(cfg.train, num_steps=4, input_ring_capacity=0),
    )
    assert cfg.precision.needs_loss_scaling
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    mesh = make_mesh(1)
    params = shard_params(params, mesh)

    audio, labels = _data()
    bad = audio.copy()
    bad[:] = np.nan

    def batches():
        yield labels, bad  # step 1: poisoned -> halve + rollback
        while True:
            yield labels, audio  # clean -> double per step

    scales = {}
    with caplog.at_level(logging.WARNING, logger="audio_to_midi_tpu.train.loop"):
        loop.train(
            cfg, params, state, tx, opt_state, batches(), None, sched, rope,
            num_model_output_frames=20, mesh=mesh,
            step_hook=lambda s, info: scales.__setitem__(s, info["grad_scale"]),
        )
    assert any(
        "rolling back, grad scale 1.0 -> 0.5" in r.message for r in caplog.records
    ), [r.message for r in caplog.records]
    # Step 1 rolled back (no hook fires); steps 2-4 are clean and double the
    # halved scale each time: 0.5 -> 1 -> 2 -> 4.
    assert scales, scales
    assert scales[max(scales)] == pytest.approx(4.0), scales


def test_ring_refuses_nonfinite_chunks(caplog):
    """Ring slots are resampled for many steps, so one NaN window would
    poison every later batch (found by the f16 state-machine test: training
    could never recover after a poisoned batch entered the pool).  The
    feeder must drop non-finite chunks loudly and keep the pool clean."""
    import logging

    from audio_to_midi_tpu.data.device_ring import DeviceInputRing, _Feeder

    audio_bad = np.full((4, 2, 64), np.nan, np.float32)
    audio_ok = np.random.default_rng(0).standard_normal((4, 2, 64)).astype(np.float32)
    labels = np.zeros((4, 8, 90), np.float32)

    with caplog.at_level(logging.WARNING, logger="audio_to_midi_tpu.data.device_ring"):
        feeder = _Feeder(iter([(labels, audio_bad), (labels, audio_ok)]))
        ring = DeviceInputRing(capacity=8, chunk_windows=4)
        ring.pull(feeder, min_fill=4)
    assert ring.filled == 4  # only the clean chunk was admitted
    audio_mb, _ = ring.sample(jax.random.PRNGKey(0), 8, 4, None)
    assert np.isfinite(np.asarray(audio_mb)).all()
    assert any("non-finite" in r.message for r in caplog.records)


def test_host_augmenting_loader_disables_device_augment():
    """A loader built with transform_settings (the pre-ring canonical
    pattern) augments on the HOST; with augment_on_device now defaulting to
    True the loop must trust the loader — disabling on-device augmentation
    (no double augment) and the ring (no reuse of host-augmented windows) —
    instead of silently degrading the training distribution."""
    from audio_to_midi_tpu.config import TransformSettings
    from audio_to_midi_tpu.train import loop

    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_steps=2, print_every=1)
    )
    assert cfg.train.augment_on_device and cfg.transforms is not None

    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    mesh = make_mesh(1)
    params = shard_params(params, mesh)
    audio, labels = _data()

    class HostAugmentingLoader:
        transform_settings = TransformSettings()  # host augmentation marker

        def __iter__(self):
            while True:
                yield labels, audio

    with pytest.warns(UserWarning, match="host augmentation"):
        loop.train(
            cfg, params, state, tx, opt_state, HostAugmentingLoader(), None,
            sched, rope, num_model_output_frames=20, mesh=mesh,
        )


def test_ring_feeder_all_garbage_source_fails_fast():
    """A source producing ONLY non-finite chunks must abort the blocking
    fill quickly (feeder error after 8 consecutive drops), not block the
    pull stall budget (~30 min) while the pool stays empty."""
    from audio_to_midi_tpu.data.device_ring import DeviceInputRing, _Feeder

    audio_bad = np.full((4, 2, 64), np.nan, np.float32)
    labels = np.zeros((4, 8, 90), np.float32)

    def poisoned():
        while True:
            yield labels, audio_bad

    feeder = _Feeder(poisoned(), depth=2)
    ring = DeviceInputRing(capacity=8, chunk_windows=4)
    with pytest.raises(RuntimeError, match="input feed thread failed") as ei:
        ring.pull(feeder, min_fill=4)
    assert "non-finite" in str(ei.value.__cause__)


def test_fused_flat_optimizer_matches_per_leaf():
    """The raveled-vector AdamW chain (TrainConfig.fused_flat_optimizer) is
    the per-leaf chain element-for-element: same updates, multiple steps,
    full production param tree."""
    import dataclasses

    cfg = Config()  # production model geometry
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    tx_flat, _ = optim.setup_optimizers(
        params, cfg.model,
        dataclasses.replace(cfg.train, fused_flat_optimizer=True),
    )
    tx_leaf, _ = optim.setup_optimizers(
        params, cfg.model,
        dataclasses.replace(cfg.train, fused_flat_optimizer=False),
    )
    import optax

    p_a = p_b = params
    s_a, s_b = tx_flat.init(p_a), tx_leaf.init(p_b)
    for i in range(3):
        grads = jax.tree.map(
            lambda p: 1e-3 * jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), i), p.shape
            ),
            p_a,
        )
        u_a, s_a = tx_flat.update(grads, s_a, p_a)
        u_b, s_b = tx_leaf.update(grads, s_b, p_b)
        for x, y in zip(jax.tree.leaves(u_a), jax.tree.leaves(u_b)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-12
            )
        p_a = optax.apply_updates(p_a, u_a)
        p_b = optax.apply_updates(p_b, u_b)


def test_remat_and_unroll_flags_are_grad_exact():
    """The measured perf knobs (transformer_remat, cnn_remat,
    transformer_scan_unroll, cnn_scan_unroll) change scheduling/memory only:
    identical loss and gradients (STEPTIME round 4 defaults vs
    reference-parity settings)."""
    from audio_to_midi_tpu.train.loss import batch_loss

    cfg = small_config()
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 200))  # -> 20 frames
    l = jnp.zeros((2, 20, 90))

    outs = []
    for remat, unroll, cnn_unroll in (
        (True, 1, 1), (False, 8, 21), (False, 1, 1), (True, 8, 21),
        (True, 1, 3),
    ):
        m = dataclasses.replace(
            cfg.model, transformer_remat=remat, cnn_remat=remat,
            transformer_scan_unroll=unroll, cnn_scan_unroll=cnn_unroll,
        )
        v, g = jax.value_and_grad(batch_loss)(
            params, m, a, l, rope, jnp.float32(1.0), None, jnp.float32, False
        )
        outs.append((float(v), g))
    for v, g in outs[1:]:
        np.testing.assert_allclose(v, outs[0][0], rtol=1e-6)
        for x, y in zip(jax.tree.leaves(g), jax.tree.leaves(outs[0][1])):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6
            )
