"""cnn_scan_unroll compile-time/step-time knee (VERDICT r04 #5).

Round 4 shipped cnn_scan_unroll=21 (fully unrolled) off a step-time A/B, but
the cold compile of the unrolled step costs ~17 min over the tunnel at any
new batch shape.  This ladder measures BOTH sides at unroll {1, 3, 7, 21}
x batch shapes {64/mb32, 32/mb16}:

  * cold compile: the first jitted call, against a FRESH compilation-cache
    dir per config (the production cache is left untouched);
  * step time: steady-state over --iters steps, median of 3 passes.

Writes UNROLL_KNEE.json; PERF.md gets the table and the default gets
re-justified from it.

Usage: python tools/unroll_knee.py [--iters 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--unrolls", type=int, nargs="+", default=[1, 3, 7, 21])
    p.add_argument("--out", default="UNROLL_KNEE.json")
    p.add_argument("--shapes", default="64:32,32:16",
                   help="comma list of batch:minibatch")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step, reshape_to_minibatches, setup_optimizers,
    )

    results = {}
    shapes = [tuple(map(int, s.split(":"))) for s in args.shapes.split(",")]

    for batch, mb in shapes:
        for unroll in args.unrolls:
            tag = f"b{batch}_mb{mb}_cu{unroll}"
            # fresh cache dir => true cold compile, production cache untouched
            cache_dir = tempfile.mkdtemp(prefix="knee_cache_")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

            cfg = Config(
                model=dataclasses.replace(
                    Config().model, cnn_scan_unroll=unroll
                ),
                train=TrainConfig(
                    batch_size=batch, minibatch_size_per_device=mb
                ),
            )
            mesh = make_mesh(1)
            rope = model_lib.make_rope(cfg.model)
            params, _ = model_lib.init_ensemble(
                jax.random.PRNGKey(0), cfg.model, 1
            )
            params = shard_params(params, mesh)
            tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
            opt = jax.vmap(tx.init)(params)
            step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
            nf = cfg.model.output_frames(cfg.data.samples_per_window)
            audio = jax.random.normal(
                jax.random.PRNGKey(1),
                (batch, 2, cfg.data.samples_per_window), jnp.float32,
            )
            labels = (
                jax.random.uniform(jax.random.PRNGKey(2), (batch, nf, 90)) > 0.95
            ).astype(jnp.float32)
            amb = reshape_to_minibatches(audio, mb)
            lmb = reshape_to_minibatches(labels, mb)
            key = jax.random.PRNGKey(3)
            scale = jnp.asarray(1.0, jnp.float32)
            st = {"p": params, "o": opt}

            def one():
                out = step(st["p"], st["o"], amb, lmb, key, scale)
                st["p"], st["o"] = out.params, out.opt_state
                return out.loss

            t0 = time.perf_counter()
            jax.block_until_ready(one())
            compile_s = time.perf_counter() - t0
            jax.block_until_ready(one())
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = one()
                jax.block_until_ready(out)
                times.append((time.perf_counter() - t0) / args.iters * 1e3)
            ms = sorted(times)[1]
            results[tag] = {
                "cold_compile_s": round(compile_s, 1),
                "step_ms": round(ms, 2),
                "steps_per_s": round(1e3 / ms, 2),
            }
            print(
                f"{tag}: compile {compile_s:.1f}s step {ms:.2f} ms",
                flush=True,
            )
            Path(args.out).write_text(json.dumps(results, indent=2) + "\n")

    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
