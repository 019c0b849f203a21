"""End-to-end training demonstration on synthetic data.

Generates a train set and a held-out validation set of synthetic piano
performances, trains the full default model with the full augmentation suite
through the real data pipeline (grain/threaded loader -> train loop ->
checkpoints), and reports held-out loss / hit-rate / eventized-diff — the
reference's README workflow, self-contained.

Usage: python tools/synthetic_train_demo.py [--steps 3000] [--batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from audio_to_midi_tpu.config import Config, TrainConfig  # noqa: E402
from audio_to_midi_tpu.data import loader, synthetic  # noqa: E402
from audio_to_midi_tpu.models import model as model_lib  # noqa: E402
from audio_to_midi_tpu.parallel import make_mesh, shard_params  # noqa: E402
from audio_to_midi_tpu.train import (  # noqa: E402
    checkpoint as ckpt,
    loop,
    setup_optimizers,
)
from audio_to_midi_tpu.train.evaluate import compute_testset_loss  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--minibatch", type=int, default=16)
    p.add_argument("--train-samples", type=int, default=24)
    p.add_argument("--val-samples", type=int, default=4)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--workdir", default=None)
    p.add_argument(
        "--variety", action="store_true",
        help="timbre-varied + chordal synthetic data (generalization mode)",
    )
    fam = p.add_mutually_exclusive_group()
    fam.add_argument(
        "--family-split", action="store_true",
        help="cross-family generalization: train on the 'percussive' family, "
        "hold out BOTH unseen-percussive and the structurally-disjoint "
        "'sustained' family (slow attack, inharmonic partials, tremolo)",
    )
    fam.add_argument(
        "--family-mixed", action="store_true",
        help="corpus-coverage twin of --family-split: train on a 50/50 mix "
        "of both families against the IDENTICAL holdout sets (same seeds), "
        "so the two runs differ only in training-corpus coverage",
    )
    p.add_argument(
        "--timbre-aug", action="store_true",
        help="enable the timbre-perturbing device augmentations (random EQ, "
        "dynamics warp, AM jitter — config.TransformSettings extensions, off "
        "by default): the r05 intervention against cross-family timbre "
        "overfitting (GENBENCH_r04)",
    )
    p.add_argument("--json-out", default=None, help="write results JSON here")
    p.add_argument(
        "--eval-every", type=int, default=0,
        help="evaluate the holdout every N steps and record a metric curve",
    )
    p.add_argument(
        "--no-ring", action="store_true",
        help="disable the device input ring (per-step host wire feed) — for "
        "the ring-vs-wire quality A/B (VERDICT r04 #6)",
    )
    p.add_argument(
        "--fast-compile", action="store_true",
        help="scan-unroll 1 everywhere (same gradients, ~4 ms/step slower, "
        "cold-compiles in ~1-2 min instead of ~17 over the tunnel) — for "
        "quality runs on a cold compile cache",
    )
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, force=True)  # jax grabs root first

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()

    work = Path(args.workdir or tempfile.mkdtemp(prefix="a2m_demo_"))
    import os

    os.environ.setdefault("SAMPLE_CACHE_DIR", str(work / "cache"))
    train_dir, val_dir = work / "train", work / "val"
    train_family = None
    if args.family_split:
        train_family = "percussive"
    elif args.family_mixed:
        train_family = "mixed"
    synthetic.make_synthetic_dataset(
        train_dir, num_samples=args.train_samples, duration_s=5.0,
        notes_per_sample=8, seed=100, variety=args.variety,
        family=train_family,
    )
    # In both family modes the holdouts are the SAME datasets (same seeds,
    # same families): unseen-percussive + unseen-sustained.  The split vs
    # mixed runs then differ only in what the training corpus covers.
    synthetic.make_synthetic_dataset(
        val_dir, num_samples=args.val_samples, duration_s=5.0,
        notes_per_sample=8, seed=999, variety=args.variety,
        family="percussive" if train_family else None,
    )
    cross_dir = None
    if train_family:
        # Structurally-disjoint holdout family: unseen generator, not just
        # unseen samples (VERDICT r03 next #3).
        cross_dir = work / "val_cross"
        synthetic.make_synthetic_dataset(
            cross_dir, num_samples=args.val_samples, duration_s=5.0,
            notes_per_sample=8, seed=555, family="sustained",
        )

    model_kw = {}
    if args.fast_compile:
        model_kw = dict(cnn_scan_unroll=1, transformer_scan_unroll=1)
    transforms = Config().transforms
    if args.timbre_aug:
        transforms = dataclasses.replace(
            transforms,
            eq_probability=0.8,
            dynamics_warp_probability=0.5,
            am_jitter_probability=0.5,
        )
    cfg = Config(
        model=dataclasses.replace(Config().model, **model_kw),
        transforms=transforms,
        train=TrainConfig(
            batch_size=args.batch,
            minibatch_size_per_device=args.minibatch,
            num_steps=args.steps,
            warmup_steps=100,
            base_learning_rate=args.lr,
            print_every=100,
            testset_loss_every=(args.eval_every or 10**9),
            checkpoint_every=1000,
            **({"input_ring_capacity": 0} if args.no_ring else {}),
        )
    )
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)

    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    manager = ckpt.create_checkpoint_manager(
        work / "ckpt", cfg, save_interval_steps=cfg.train.checkpoint_every
    )
    restored = ckpt.restore_checkpoint(manager, params, state)
    if restored is not None:
        params, state, restored_step = restored
        params = shard_params(params, mesh)
        print(f"resuming from step {restored_step}", flush=True)

    data_loader = loader.create_dataset_loader(
        train_dir,
        batch_size=cfg.train.batch_size,
        num_workers=0,
        num_epochs=10**6,
        output_divisions=num_frames,
        # Full augmentation suite runs ON DEVICE by default
        # (TrainConfig.augment_on_device) — the loader feeds raw windows.
        transform_settings=None,
        use_grain=False,
    )

    curve: list[list] = []

    class _CurveWriter:
        """summary_writer shim capturing the loop's holdout eval scalars.

        The partial curve is flushed to ``<json_out>.partial`` after every
        scalar so an interrupted run still leaves its metric history behind.
        """

        def add_scalar(self, tag, value, step):
            if tag.startswith("train/test-"):
                curve.append([tag.removeprefix("train/test-"), step, value])
                if args.json_out:
                    import json

                    Path(args.json_out + ".partial").write_text(
                        json.dumps({"holdout_curve": curve}) + "\n"
                    )

        def add_figure(self, *a, **k):
            pass

        def flush(self):
            pass

    testsets = {"holdout": val_dir}
    if cross_dir is not None:
        testsets["holdout-cross"] = cross_dir
    params, state, opt_state = loop.train(
        cfg, params, state, tx, opt_state, data_loader, manager, sched,
        rope, num_frames, mesh=mesh,
        testset_dirs=testsets if args.eval_every else None,
        summary_writer=_CurveWriter() if args.eval_every else None,
    )
    manager.wait_until_finished()

    evals = [("train", train_dir), ("holdout", val_dir)]
    if cross_dir is not None:
        evals.append(("holdout_cross", cross_dir))
    results = {}
    for name, d in evals:
        loss, hit, eventized, _ = compute_testset_loss(
            params, cfg, d, num_frames, rope, ensemble=True
        )
        results[name] = {
            "loss": round(float(loss[0]), 2),
            "hit_rate": round(float(hit[0]), 4),
            "eventized_diff": round(float(eventized[0]), 2),
        }
        print(
            f"{name}: loss={float(loss[0]):.2f} hit_rate={float(hit[0]):.4f} "
            f"eventized_diff={float(eventized[0]):.2f}",
            flush=True,
        )
    if args.json_out:
        import json

        meta = {
            "steps": args.steps, "batch": args.batch,
            "train_samples": args.train_samples, "variety": args.variety,
            "train_family": train_family,
            "timbre_aug": args.timbre_aug,
        }
        if curve:
            meta["holdout_curve"] = curve
        Path(args.json_out).write_text(
            json.dumps({**meta, **results}, indent=2) + "\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
