"""Train-loop integration: in-loop test-set evaluation, tensorboard hook,
and genetic ensemble evolution with a population of 4."""

import dataclasses

import jax
import numpy as np
import pytest

from audio_to_midi_tpu.data import loader, synthetic
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.parallel import make_mesh, shard_params
from audio_to_midi_tpu.train import checkpoint as ckpt, loop, setup_optimizers
from tests.test_e2e import E2E_CFG


class _Writer:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), step))

    def add_figure(self, *a, **k):
        pass

    def flush(self):
        pass


@pytest.mark.slow
def test_loop_with_eval_and_evolution(tmp_path):
    d = tmp_path / "data"
    synthetic.make_synthetic_dataset(d, num_samples=2, duration_s=0.6,
                                     notes_per_sample=2, seed=11)
    cfg = dataclasses.replace(
        E2E_CFG,
        train=dataclasses.replace(
            E2E_CFG.train,
            ensemble_size=4,
            num_steps=2,
            testset_loss_every=2,   # trigger eval + evolution inside the loop
            checkpoint_every=2,
        ),
    )
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    mesh = make_mesh(cfg.train.ensemble_size)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 4)
    params = shard_params(params, mesh, ensemble=True)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    manager = ckpt.create_checkpoint_manager(tmp_path / "ck", cfg, save_interval_steps=2)

    dl = loader.create_dataset_loader(
        d, batch_size=cfg.train.batch_size, num_workers=0, num_epochs=10**6,
        sample_rate=cfg.data.sample_rate, duration=cfg.data.model_audio_length,
        output_divisions=num_frames, use_grain=False,
    )
    writer = _Writer()
    params, state, opt_state = loop.train(
        cfg, params, state, tx, opt_state, dl, manager, sched, rope,
        num_frames, testset_dirs={"synth": d}, summary_writer=writer, mesh=mesh,
    )
    manager.wait_until_finished()

    tags = {t for t, _, _ in writer.scalars}
    assert "train/loss" in tags
    assert "train/test-loss-synth" in tags
    # params still a 4-member population with finite values
    leaf = np.asarray(jax.tree.leaves(params)[0])
    assert leaf.shape[0] == 4
    assert np.isfinite(leaf).all()
    # Evolution must re-place params with the population axis still sharded
    # over the mesh "ensemble" dim (round-1 regression: shard_params was
    # called without ensemble=True, silently replicating params).
    for p in jax.tree.leaves(params):
        assert p.sharding.spec[0] == "ensemble", p.sharding


@pytest.mark.slow
def test_loop_with_device_augmentation(tmp_path):
    """augment_on_device=True: loader feeds raw windows, the nine transforms
    run as a jitted device program per batch, training proceeds normally."""
    d = tmp_path / "data"
    synthetic.make_synthetic_dataset(d, num_samples=2, duration_s=0.6,
                                     notes_per_sample=2, seed=12)
    cfg = dataclasses.replace(
        E2E_CFG,
        train=dataclasses.replace(
            E2E_CFG.train, num_steps=2, augment_on_device=True,
        ),
    )
    assert cfg.transforms is not None
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    dl = loader.create_dataset_loader(
        d, batch_size=cfg.train.batch_size, num_workers=0, num_epochs=10**6,
        sample_rate=cfg.data.sample_rate, duration=cfg.data.model_audio_length,
        output_divisions=num_frames, use_grain=False,
        transform_settings=None,  # raw windows; transforms happen on device
    )
    params, state, opt_state = loop.train(
        cfg, params, state, tx, opt_state, dl, None, sched, rope,
        num_frames, mesh=mesh,
    )
    leaf = np.asarray(jax.tree.leaves(params)[0])
    assert np.isfinite(leaf).all()
