"""CLI surface tests: train a tiny model via train_cli with a JSON config,
then transcribe and validate through the audio_to_midi / infer CLIs."""

import dataclasses
import json

import numpy as np
import pytest

from audio_to_midi_tpu.config import config_from_json, config_to_json
from audio_to_midi_tpu.data import synthetic
from tests.test_e2e import E2E_CFG


def test_config_json_roundtrip():
    text = config_to_json(E2E_CFG)
    cfg = config_from_json(text)
    assert cfg == E2E_CFG
    # defaults survive partial configs
    partial = json.dumps({"train": {"batch_size": 4}})
    cfg2 = config_from_json(partial)
    assert cfg2.train.batch_size == 4
    assert cfg2.model.dims == E2E_CFG.model.dims or len(cfg2.model.dims) == 7


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    dataset = root / "dataset"
    names = synthetic.make_synthetic_dataset(
        dataset, num_samples=2, duration_s=0.8, notes_per_sample=3, seed=9
    )
    cfg = dataclasses.replace(
        E2E_CFG,
        train=dataclasses.replace(E2E_CFG.train, num_steps=2, checkpoint_every=1),
    )
    cfg_path = root / "config.json"
    cfg_path.write_text(config_to_json(cfg))

    # Train the checkpoint the other CLI tests consume (so each test can also
    # run standalone).
    from audio_to_midi_tpu.cli.train_cli import main as train_main

    rc = train_main([
        "--dataset", str(dataset),
        "--checkpoint", str(root / "ckpt"),
        "--config", str(cfg_path),
        "--num-workers", "0",
        "--no-tensorboard",
    ])
    assert rc == 0
    return root, dataset, names, cfg_path


def test_train_cli(cli_env):
    root, dataset, names, cfg_path = cli_env
    assert (root / "ckpt").exists()
    from audio_to_midi_tpu.train.checkpoint import restore_raw

    _params, step = restore_raw(root / "ckpt")
    assert step == 2


def test_audio_to_midi_cli_transcribe(cli_env, capsys):
    root, dataset, names, cfg_path = cli_env
    from audio_to_midi_tpu.cli.audio_to_midi import main
    from audio_to_midi_tpu.data.loader import resolve_audio_file

    audio_file = resolve_audio_file(dataset / names[0])
    out_midi = root / "out.mid"
    rc = main([
        str(audio_file), str(out_midi),
        "--checkpoint", str(root / "ckpt"),
        "--config", str(cfg_path),
        "--overlap", "0.1",
    ])
    assert rc == 0
    assert out_midi.exists()
    assert "Stitched probs shape" in capsys.readouterr().out


def test_audio_to_midi_cli_validation(cli_env, capsys):
    root, dataset, names, cfg_path = cli_env
    from audio_to_midi_tpu.cli.audio_to_midi import main

    rc = main([
        str(dataset), "--validation",
        "--checkpoint", str(root / "ckpt"),
        "--config", str(cfg_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Validation loss:" in out
    assert "Hit rate:" in out
    assert "Eventized diff:" in out


def test_audio_to_midi_cli_validation_individual(cli_env, capsys):
    root, dataset, names, cfg_path = cli_env
    from audio_to_midi_tpu.cli.audio_to_midi import main

    rc = main([
        str(dataset), "--validation", "--individual",
        "--checkpoint", str(root / "ckpt"),
        "--config", str(cfg_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert all(name in out for name in names)


def test_infer_cli(cli_env, capsys):
    root, dataset, names, cfg_path = cli_env
    from audio_to_midi_tpu.cli.infer_cli import main
    from audio_to_midi_tpu.data.loader import resolve_audio_file

    audio_file = resolve_audio_file(dataset / names[1])
    rc = main([
        str(audio_file),
        "--midi", str(root / "out2.mid"),
        "--checkpoint", str(root / "ckpt"),
        "--config", str(cfg_path),
        "--overlap", "0.1",
    ])
    assert rc == 0
    assert (root / "out2.mid").exists()


def test_inspect_model_cli(cli_env, capsys):
    root, *_ = cli_env
    from audio_to_midi_tpu.cli.inspect_model import main

    rc = main([str(root / "ckpt"), "--no-histograms"])
    assert rc == 0
    assert "Total parameters" in capsys.readouterr().out


def test_copy_weights_cli(cli_env, capsys, monkeypatch):
    root, dataset, names, cfg_path = cli_env
    from audio_to_midi_tpu.cli import copy_weights

    # Patch the default config to the small one so shapes match
    from audio_to_midi_tpu import config as config_mod

    cfg = config_from_json(cfg_path.read_text())
    monkeypatch.setattr(copy_weights, "main", copy_weights.main)
    # run mapping directly: old ckpt -> same-architecture migration
    import jax

    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.train.checkpoint import restore_raw

    old_params, step = restore_raw(root / "ckpt")
    new_params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    merged, copied, fresh = copy_weights.copy_matching_leaves(old_params, new_params)
    assert copied > 0
    # identical architecture: everything copied
    assert fresh == 0
