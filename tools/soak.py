"""Sustained reference-scale training soak on TPU (VERDICT r2 item 5).

Phases:
  A. train at reference hyperparams (batch 64, minibatch 8, checkpoints every
     20, periodic testset eval) over the REAL loader path (ThreadedBatchLoader
     + device input ring) — killed mid-run by the orchestrator (SIGKILL);
  B. resume from the latest checkpoint and continue to --steps;
  C. a shorter leg under the f16 loss-scaling policy, exercising the
     scale-halving/doubling state machine on real hardware.

Writes SOAK_r03.json: steps/s, loss curve, resume step, loss-scale events.

Orchestrator:  python tools/soak.py --steps 3000 [--kill-at-s 600]
Worker phases: python tools/soak.py --worker --steps N [--f16] (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORK = Path(tempfile.gettempdir()) / "a2m_soak"


def worker(steps: int, f16: bool, progress_file: Path, eval_every: int) -> int:
    import dataclasses

    import jax

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax.numpy as jnp
    import numpy as np

    from audio_to_midi_tpu.config import Config, PrecisionConfig, TrainConfig
    from audio_to_midi_tpu.data import loader as loader_lib, synthetic
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        checkpoint as ckpt,
        loop,
        setup_optimizers,
    )

    WORK.mkdir(parents=True, exist_ok=True)
    os.environ.setdefault("SAMPLE_CACHE_DIR", str(WORK / "cache"))
    data_dir = WORK / ("data_f16" if f16 else "data")
    holdout_dir = WORK / "holdout"
    if not (data_dir / "done").exists():
        synthetic.make_synthetic_dataset(
            data_dir, num_samples=32, duration_s=10.0, notes_per_sample=8, seed=7
        )
        (data_dir / "done").touch()
    if not (holdout_dir / "done").exists():
        synthetic.make_synthetic_dataset(
            holdout_dir, num_samples=3, duration_s=5.0, notes_per_sample=6, seed=99
        )
        (holdout_dir / "done").touch()

    cfg = Config(
        train=TrainConfig(
            batch_size=64,
            minibatch_size_per_device=8,
            num_steps=steps,
            warmup_steps=200,
            checkpoint_every=20,
            checkpoints_to_keep=3,
            testset_loss_every=eval_every,
            print_every=20,
        ),
        precision=PrecisionConfig(
            compute_dtype=jnp.float16 if f16 else jnp.bfloat16
        ),
    )
    ckpt_dir = WORK / ("ckpt_f16" if f16 else "ckpt")
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)

    params, state = model_lib.init_ensemble(jax.random.PRNGKey(1), cfg.model, 1)
    manager = ckpt.create_checkpoint_manager(
        ckpt_dir, cfg, max_to_keep=3, save_interval_steps=20
    )
    restored = ckpt.restore_checkpoint(manager, params, state)
    resume_step = None
    if restored is not None:
        params, state, resume_step = restored
        print(f"RESUMED at step {resume_step}", flush=True)
    params = shard_params(params, mesh)
    tx, sched = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    opt_state = shard_params(opt_state, mesh)

    data_loader = loader_lib.ThreadedBatchLoader(
        data_dir,
        batch_size=cfg.train.batch_size,
        num_model_output_frames=num_frames,
        num_workers=cfg.train.dataset_num_workers,
        transform_settings=None,  # on-device augmentation (default)
    )

    progress = open(progress_file, "a")

    def hook(step, info):
        rec = {
            "phase": "f16" if f16 else "bf16",
            "step": step,
            "loss": float(np.min(info["loss"])),
            "steps_per_s": round(info["steps_per_s"], 3),
            "t": round(time.time(), 1),
        }
        if resume_step is not None:
            rec["resumed_from"] = resume_step
        progress.write(json.dumps(rec) + "\n")
        progress.flush()

    with data_loader:
        loop.train(
            cfg, params, state, tx, opt_state, data_loader, manager, sched,
            rope, num_frames, testset_dirs={"holdout": holdout_dir},
            mesh=mesh, step_hook=hook,
        )
    manager.wait_until_finished()
    print("WORKER DONE", flush=True)
    return 0


def orchestrate(
    steps: int, kill_at_s: float, f16_steps: int, only_f16: bool = False
) -> int:
    WORK.mkdir(parents=True, exist_ok=True)
    progress_file = WORK / "progress.jsonl"

    def spawn(extra):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"] + extra,
            cwd=str(Path(__file__).resolve().parent.parent),
        )

    killed_at = None
    rcB = None
    if only_f16:
        # Re-run just phase C (keeps prior bf16 phase A/B records in the
        # progress file); drop stale f16 records and checkpoints first.
        if progress_file.exists():
            kept = [
                line
                for line in progress_file.read_text().splitlines()
                if line.strip() and json.loads(line)["phase"] != "f16"
            ]
            progress_file.write_text("\n".join(kept) + "\n")
        import shutil

        shutil.rmtree(WORK / "ckpt_f16", ignore_errors=True)
        prior = (
            json.loads(Path("SOAK_r03.json").read_text())
            if Path("SOAK_r03.json").exists()
            else {}
        )
        killed_at = prior.get("phaseA_killed_after_s")
        rcB = prior.get("phaseB_rc")
    else:
        progress_file.unlink(missing_ok=True)

        # Phase A: run, then SIGKILL mid-flight.
        t0 = time.time()
        proc = spawn(["--steps", str(steps)])
        while proc.poll() is None:
            time.sleep(5)
            if time.time() - t0 > kill_at_s:
                proc.send_signal(signal.SIGKILL)
                killed_at = time.time() - t0
                proc.wait()
                break
        print(f"phase A done (killed_at={killed_at})", flush=True)

        # Phase B: resume to completion.
        rcB = spawn(["--steps", str(steps)]).wait()
        print(f"phase B rc={rcB}", flush=True)

    # Phase C: f16 loss-scaling leg.
    rcC = spawn(["--steps", str(f16_steps), "--f16"]).wait()
    print(f"phase C rc={rcC}", flush=True)

    records = [
        json.loads(line)
        for line in progress_file.read_text().splitlines()
        if line.strip()
    ]
    bf16 = [r for r in records if r["phase"] == "bf16"]
    f16 = [r for r in records if r["phase"] == "f16"]
    resume_steps = sorted({r["resumed_from"] for r in records if "resumed_from" in r})
    losses = [(r["step"], r["loss"]) for r in bf16]
    out = {
        "steps_target": steps,
        "phaseA_killed_after_s": round(killed_at, 1) if killed_at else 0.0,
        "resume_steps": resume_steps,
        "bf16_steps_per_s": (
            round(sorted(r["steps_per_s"] for r in bf16)[len(bf16) // 2], 2)
            if bf16 else None
        ),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_curve_every_20": losses[:: max(1, len(losses) // 50)],
        "f16_leg": {
            "steps": f16_steps,
            "loss_first": f16[0]["loss"] if f16 else None,
            "loss_last": f16[-1]["loss"] if f16 else None,
            "steps_per_s": (
                round(sorted(r["steps_per_s"] for r in f16)[len(f16) // 2], 2)
                if f16 else None
            ),
        },
        "phaseB_rc": rcB,
        "phaseC_rc": rcC,
    }
    Path("SOAK_r03.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--f16", action="store_true")
    ap.add_argument("--kill-at-s", type=float, default=600.0)
    ap.add_argument("--f16-steps", type=int, default=500)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument(
        "--only-f16", action="store_true",
        help="re-run just phase C, merging with prior phase A/B results",
    )
    args = ap.parse_args()
    if args.worker:
        return worker(args.steps, args.f16, WORK / "progress.jsonl", args.eval_every)
    return orchestrate(args.steps, args.kill_at_s, args.f16_steps, args.only_f16)


if __name__ == "__main__":
    raise SystemExit(main())
