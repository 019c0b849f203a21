"""Training CLI (reference train.py main(), train.py:732-892).

Usage:
  python -m audio_to_midi_tpu.cli.train_cli --dataset DIR
      [--testset NAME=DIR ...] [--steps N] [--batch-size N] [--checkpoint DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from pathlib import Path

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the audio-to-midi model on TPU.")
    p.add_argument("--dataset", required=True, help="Training dataset directory")
    p.add_argument(
        "--testset", action="append", default=[],
        help="name=dir validation sets (repeatable)",
    )
    p.add_argument("--checkpoint", default="audio_to_midi_checkpoints")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--ensemble-size", type=int, default=None)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument(
        "--precision", choices=["bf16", "f16", "f32"], default=None,
        help="Compute dtype (default bf16; overrides --config when given)",
    )
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--config", default=None, help="Config JSON file")
    # Multi-host (DCN) bring-up: pass all three on every host.
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from ..config import PrecisionConfig, load_config
    from ..parallel.mesh import initialize_multihost

    initialize_multihost(
        args.coordinator_address, args.num_processes, args.process_id
    )
    from ..metrics import configure_tensorboard
    from ..models import model as model_lib
    from ..parallel.mesh import make_mesh
    from ..data.loader import create_dataset_loader
    from ..train import (
        checkpoint as ckpt,
        loop,
        setup_optimizers,
    )

    cfg = load_config(args.config)
    train_cfg = cfg.train
    overrides = {}
    if args.steps is not None:
        overrides["num_steps"] = args.steps
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.ensemble_size is not None:
        overrides["ensemble_size"] = args.ensemble_size
    if args.num_workers is not None:
        overrides["dataset_num_workers"] = args.num_workers
    if args.learning_rate is not None:
        overrides["base_learning_rate"] = args.learning_rate
    if overrides:
        train_cfg = dataclasses.replace(train_cfg, **overrides)
    # --precision wins over --config when given explicitly; with neither,
    # the bf16 default applies.
    if args.precision is not None or args.config is None:
        precision = {
            "bf16": PrecisionConfig(compute_dtype=jnp.bfloat16),
            "f16": PrecisionConfig(compute_dtype=jnp.float16),
            "f32": PrecisionConfig(compute_dtype=jnp.float32),
        }[args.precision or "bf16"]
        cfg = dataclasses.replace(cfg, train=train_cfg, precision=precision)
    else:
        cfg = dataclasses.replace(cfg, train=train_cfg)

    num_devices = len(jax.devices())
    # Effective minibatch mirrors loop.py: per-device size x the mesh's
    # "data" extent (devices / ensemble), clamped to the batch size.
    if cfg.train.ensemble_size > 1 and num_devices % cfg.train.ensemble_size == 0:
        data_extent = num_devices // cfg.train.ensemble_size
    else:
        data_extent = num_devices
    minibatch = min(
        cfg.train.minibatch_size_per_device * data_extent, cfg.train.batch_size
    )
    logging.info(
        "Training on %d device(s), batch %d, minibatch %d",
        num_devices, cfg.train.batch_size, minibatch,
    )

    summary_writer = None if args.no_tensorboard else configure_tensorboard()
    if summary_writer is not None:
        hparams = dict(cfg.model.metadata())
        hparams["train/batch_size"] = cfg.train.batch_size
        hparams["train/total_steps"] = cfg.train.num_steps
        hparams["train/warmup_steps"] = cfg.train.warmup_steps
        hparams = {
            k: (str(v) if isinstance(v, (list, tuple)) else v)
            for k, v in hparams.items()
        }
        summary_writer.add_hparams(hparams, {})

    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(
        jax.random.PRNGKey(1), cfg.model, cfg.train.ensemble_size
    )
    if cfg.train.use_custom_init:
        # Reference train.py:573-644 (call disabled there at :792).
        from ..train.init_surgery import apply_init_surgery

        surgery_keys = jax.random.split(jax.random.PRNGKey(2), cfg.train.ensemble_size)
        params = jax.vmap(
            lambda p, k: apply_init_surgery(p, k, cfg.model.num_transformer_heads)
        )(params, surgery_keys)

    manager = ckpt.create_checkpoint_manager(
        Path(args.checkpoint), cfg,
        max_to_keep=cfg.train.checkpoints_to_keep,
        save_interval_steps=cfg.train.checkpoint_every,
    )
    ckpt.check_metadata(manager, cfg)
    restored = ckpt.restore_checkpoint(manager, params, state)
    if restored is not None:
        params, state, restored_step = restored
        logging.info("Restored checkpoint at step %d", restored_step)

    mesh = make_mesh(
        cfg.train.ensemble_size, model_size=cfg.train.model_parallel_size
    )
    from ..parallel.mesh import make_param_placer

    ensemble = cfg.train.ensemble_size > 1
    place = make_param_placer(mesh, cfg.model.num_transformer_heads)
    params = place(params, ensemble=ensemble)

    tx, lr_schedule = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    opt_state = place(opt_state, ensemble=ensemble)

    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
    data_loader = create_dataset_loader(
        Path(args.dataset),
        batch_size=cfg.train.batch_size,
        num_workers=cfg.train.dataset_num_workers,
        num_epochs=100_000,
        sample_rate=cfg.data.sample_rate,
        duration=cfg.data.model_audio_length,
        output_divisions=num_frames,
        # With on-device augmentation the loader feeds raw windows and the
        # transforms run as a jitted TPU program per batch (train/loop.py).
        transform_settings=None if cfg.train.augment_on_device else cfg.transforms,
    )

    testset_dirs = {}
    for spec in args.testset:
        name, _, d = spec.partition("=")
        testset_dirs[name] = Path(d)

    loop.train(
        cfg, params, state, tx, opt_state, data_loader, manager, lr_schedule,
        rope, num_frames, testset_dirs=testset_dirs,
        summary_writer=summary_writer, mesh=mesh,
    )
    manager.wait_until_finished()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
