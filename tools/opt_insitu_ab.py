"""In-situ optimizer-cost A/B (VERDICT r04 #3, follow-up to opt_accounting).

tools/opt_accounting.py measured the post-grad optimizer section at 0.75
ms/iter device time (scan-serialized, device-profiled) — 9x less than the
6.9 ms TRAINACCT_r04 attributed to it, because TRAINACCT's isolated section
numbers were wall-clocked per dispatch over the tunnel.  This tool closes
the loop IN SITU: it times the full production train step twice —

  real  — the shipped optimizer chain (AdamW + layerwise scale + clip);
  zero  — the identical step with ``optax.set_to_zero()`` as the
          transformation (no moments, no norm, no scale; apply/guards and
          every other instruction unchanged)

with step_timer's pipelined methodology (iters steps per sync, dispatch
amortized).  real - zero == what the optimizer math actually adds to a
step.  Runs at minibatch 8 / unroll 1 (compiles in ~1 min; the optimizer
cost is shape-independent of those knobs — it only touches the param
tree).  Writes OPT_INSITU.json.

Usage: python tools/opt_insitu_ab.py [--iters 25]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=25)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--out", default="OPT_INSITU.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step,
        reshape_to_minibatches,
        setup_optimizers,
    )

    cfg = Config(train=TrainConfig(batch_size=args.batch))
    rope = model_lib.make_rope(cfg.model)
    nf = cfg.model.output_frames(cfg.data.samples_per_window)
    mesh = make_mesh(1)
    params0, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params_host = jax.tree.map(np.asarray, params0)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 2, cfg.data.samples_per_window),
        jnp.float32,
    )
    labels = (
        jax.random.uniform(jax.random.PRNGKey(2), (args.batch, nf, 90)) > 0.95
    ).astype(jnp.float32)
    scale = jnp.asarray(1.0, jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    mb = cfg.train.minibatch_size_per_device
    amb = reshape_to_minibatches(audio, mb)
    lmb = reshape_to_minibatches(labels, mb)

    results = {}
    real_tx, _ = setup_optimizers(params0, cfg.model, cfg.train, ensemble=True)
    for tag, tx in (("real", real_tx), ("zero", optax.set_to_zero())):
        params = shard_params(jax.tree.map(jnp.asarray, params_host), mesh)
        opt = jax.vmap(tx.init)(params)
        step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
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
        results[tag] = {"ms": round(ms, 3), "runs": [round(t, 3) for t in times],
                        "compile_s": round(compile_s, 1)}
        print(f"{tag}: {ms:.3f} ms/step (compile {compile_s:.0f}s)", flush=True)

    results["opt_in_situ_ms"] = round(
        results["real"]["ms"] - results["zero"]["ms"], 3
    )
    print(f"optimizer in-situ cost: {results['opt_in_situ_ms']:.3f} ms",
          flush=True)
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
