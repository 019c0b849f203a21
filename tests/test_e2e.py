"""End-to-end pipeline tests on a small config: train a few steps over a
synthetic dataset, checkpoint, restore via the inference path, transcribe a
file to MIDI, and smoke the validation/eval path and StableHLO export."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_midi_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    PrecisionConfig,
    TrainConfig,
)
from audio_to_midi_tpu.data import loader, synthetic
from audio_to_midi_tpu import infer
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.parallel import make_mesh, shard_params
from audio_to_midi_tpu.train import (
    checkpoint as ckpt,
    loop,
    setup_optimizers,
)

# Small end-to-end config: 0.5 s windows @ 16 kHz -> 8000 samples -> 800 frames
E2E_CFG = Config(
    model=ModelConfig(
        dims=(4, 8),
        depths=(1, 1),
        num_transformer_layers=1,
        num_transformer_heads=2,
        attention_size=8,
        compressed_attention_kv_size=8,
        compressed_attention_q_size=8,
        rope_max_positions=1024,
    ),
    data=DataConfig(model_audio_length=0.5),
    precision=PrecisionConfig(compute_dtype=jnp.float32),
    train=TrainConfig(
        batch_size=8,
        minibatch_size_per_device=1,
        num_steps=3,
        warmup_steps=1,
        checkpoint_every=1,
        testset_loss_every=1000,
        print_every=1,
        ensemble_size=1,
    ),
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_dataset")
    names = synthetic.make_synthetic_dataset(
        d, num_samples=2, duration_s=0.8, notes_per_sample=3, seed=5
    )
    return d, names


def test_train_checkpoint_transcribe(dataset, tmp_path):
    d, names = dataset
    cfg = E2E_CFG
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    assert num_frames == 800

    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, lr_schedule = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    manager = ckpt.create_checkpoint_manager(
        tmp_path / "ckpt", cfg, save_interval_steps=1
    )

    data_loader = loader.create_dataset_loader(
        d,
        batch_size=cfg.train.batch_size,
        num_workers=0,
        num_epochs=100,
        sample_rate=cfg.data.sample_rate,
        duration=cfg.data.model_audio_length,
        output_divisions=num_frames,
        transform_settings=None,
        use_grain=False,
    )

    params, state, opt_state = loop.train(
        cfg, params, state, tx, opt_state, data_loader, manager, lr_schedule,
        rope, num_frames, mesh=mesh,
    )
    manager.wait_until_finished()
    assert manager.latest_step() == cfg.train.num_steps

    # --- inference path over the checkpoint ---
    from audio_to_midi_tpu.infer import load_newest_checkpoint, transcribe_file
    from audio_to_midi_tpu.ops.midi_io import read_midi_file, write_midi_file

    params2, _ = load_newest_checkpoint(tmp_path / "ckpt", cfg)
    audio_file = loader.resolve_audio_file(d / names[0])
    stitched, dpf, events = transcribe_file(params2, cfg, audio_file, overlap=0.1)
    assert stitched.shape[1] == 90
    assert stitched.shape[0] >= num_frames
    assert np.isfinite(stitched).all()
    assert isinstance(events, list)

    midi_path = tmp_path / "out.mid"
    write_midi_file(events, dpf, midi_path)
    assert midi_path.exists()
    read_midi_file(midi_path)  # parses back


def test_validation_path(dataset, tmp_path):
    d, _names = dataset
    cfg = E2E_CFG
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)

    from audio_to_midi_tpu.train.evaluate import (
        compute_testset_loss,
        compute_testset_loss_individual,
    )

    loss_map = compute_testset_loss_individual(
        params, cfg, d, num_frames, rope, ensemble=False,
        generate_visualizations=False,
    )
    assert len(loss_map) == 2
    for v in loss_map.values():
        assert np.isfinite(v["loss"]).all()
        assert 0.0 <= float(v["hit_rate"][0]) <= 1.0

    loss, hit, eventized, _ = compute_testset_loss(
        params, cfg, d, num_frames, rope, ensemble=False
    )
    assert np.isfinite(loss).all()


def test_export_stablehlo():
    cfg = dataclasses.replace(E2E_CFG, data=DataConfig(model_audio_length=0.1))
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    from audio_to_midi_tpu.export import export_stablehlo

    mlir = export_stablehlo(params, cfg, example_dtype=jnp.float32)
    assert "stablehlo" in mlir or "mhlo" in mlir
    assert "module" in mlir


def test_transcribe_file_sharded_matches_single(dataset, tmp_path):
    """Multi-chip serving: windows sharded over the mesh "data" axis produce
    the same stitched probs and events as the unsharded path (both the padded
    short path and the chunked long path)."""
    d, names = dataset
    cfg = E2E_CFG
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    mesh = make_mesh(1)  # (1, 8): pure data-parallel serving
    f = loader.resolve_audio_file(d / names[0])

    # short path (windows <= max, padded to a whole shard)
    s1, dpf1, e1 = infer.transcribe_file(params, cfg, f, rope=rope, overlap=0.1)
    s2, dpf2, e2 = infer.transcribe_file(params, cfg, f, rope=rope, overlap=0.1, mesh=mesh)
    assert dpf1 == dpf2
    np.testing.assert_allclose(s2, s1, rtol=2e-5, atol=2e-6)
    assert e1 == e2

    # chunked path: force tiny chunks so several sharded batches run
    s3, _, e3 = infer.transcribe_file(
        params, cfg, f, rope=rope, overlap=0.1, mesh=mesh, max_windows_per_batch=2
    )
    np.testing.assert_allclose(s3, s1, rtol=2e-5, atol=2e-6)
    assert e3 == e1
