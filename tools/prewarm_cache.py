"""Prewarm the persistent XLA compile cache with the standard programs.

Cold-compiling the fully-unrolled production train step over the tunnel
costs ~17 min per batch shape, and the serving program ~2-12 s per batch
size after round 5 pinned serving to unroll-1 (PERF.md).  This tool
compiles the standard shapes once into `utils/compile_cache`'s persistent
directory so first-run UX / CI / a fresh driver environment start in
seconds:

  * serving forward+stitch (bench.py program) at the bench batch sweep;
  * the production train step (batch 64, minibatch 32) and the demo-tool
    step (batch 32, minibatch 16), both at shipped defaults and at
    --fast-compile unroll-1.

Training steps are compiled AOT (.lower().compile()) — nothing executes,
so this is safe to run while the chip serves (the compile itself rides the
remote-compile relay).

Usage: python tools/prewarm_cache.py [--serving-only|--train-only]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def prewarm_serving(batches) -> None:
    import bench

    bench._startup_done.set()
    for b in batches:
        t0 = time.time()
        try:
            bench.bench_forward_stitch(b, passes=1, repeats=1)
        except Exception as e:
            print(f"serving batch {b}: FAILED {e}", flush=True)
            continue
        print(f"serving batch {b}: warm ({time.time() - t0:.0f}s)", flush=True)


def prewarm_train(batch: int, minibatch: int, fast: bool) -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step, reshape_to_minibatches, setup_optimizers,
    )

    cfg = Config(
        train=TrainConfig(batch_size=batch, minibatch_size_per_device=minibatch)
    )
    if fast:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, cnn_scan_unroll=1, transformer_scan_unroll=1
            ),
        )
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt = jax.vmap(tx.init)(params)
    step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
    nf = cfg.model.output_frames(cfg.data.samples_per_window)
    audio = jnp.zeros((batch, 2, cfg.data.samples_per_window), jnp.float32)
    labels = jnp.zeros((batch, nf, cfg.model.output_vocab), jnp.float32)
    amb = reshape_to_minibatches(audio, minibatch)
    lmb = reshape_to_minibatches(labels, minibatch)
    t0 = time.time()
    step.lower(
        params, opt, amb, lmb, jax.random.PRNGKey(1),
        jnp.asarray(1.0, jnp.float32),
    ).compile()
    tag = "unroll1" if fast else "default"
    print(
        f"train step batch={batch} mb={minibatch} {tag}: warm "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--serving-only", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument(
        "--batches", type=int, nargs="+", default=[64, 96, 128, 160, 192, 256]
    )
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    path = enable_default_cache()
    print(f"cache dir: {path}", flush=True)

    if not args.train_only:
        prewarm_serving(args.batches)
    if not args.serving_only:
        for batch, mb, fast in (
            (64, 32, False), (64, 32, True), (32, 16, False), (32, 16, True)
        ):
            try:
                prewarm_train(batch, mb, fast)
            except Exception as e:
                print(f"train {batch}/{mb}: FAILED {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
