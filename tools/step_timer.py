"""Time the FULL production train step for a small set of candidate configs
(follow-up to tools/train_accounting.py: the isolated section timings carry
a per-dispatch tunnel cost, so config decisions are made on the real step).

Usage: python tools/step_timer.py --grid "u8_remat,u8_noremat" [--iters 12]
Grid tokens: u{N} (transformer_scan_unroll), noremat/remat (transformer),
cnnnoremat, nodrop, mb{N}, fusedopt, xla (attention impl).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="base,u8,u8_trnoremat,mb16_u8")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--out", default="STEPTIME.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step,
        reshape_to_minibatches,
        setup_optimizers,
    )

    base = Config(train=TrainConfig(batch_size=args.batch))
    rope = model_lib.make_rope(base.model)
    nf = base.model.output_frames(base.data.samples_per_window)
    mesh = make_mesh(1)
    params0, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), base.model, 1)
    params_host = jax.tree.map(np.asarray, params0)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 2, base.data.samples_per_window),
        jnp.float32,
    )
    labels = (
        jax.random.uniform(jax.random.PRNGKey(2), (args.batch, nf, 90)) > 0.95
    ).astype(jnp.float32)
    scale = jnp.asarray(1.0, jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    results = {}

    for token in args.grid.split(","):
        token = token.strip()
        mb, unroll, tr_remat, cnn_remat = 8, 1, True, True
        dropout, fusedopt, impl, fastdrop = True, False, None, False
        cnn_unroll, cnn_bwdk = 1, True
        for part in token.split("_"):
            if part == "nocnnbwd":
                cnn_bwdk = False
            elif part.startswith("cu") and part[2:].isdigit():
                cnn_unroll = int(part[2:])
            elif part.startswith("u") and part[1:].isdigit():
                unroll = int(part[1:])
            elif part.startswith("mb"):
                mb = int(part[2:])
            elif part == "trnoremat":
                tr_remat = False
            elif part == "cnnnoremat":
                cnn_remat = False
            elif part == "nodrop":
                dropout = False
            elif part == "fastdrop":
                fastdrop = True
            elif part == "fusedopt":
                fusedopt = True
            elif part == "xla":
                impl = "xla"
        cfg = dataclasses.replace(
            base,
            model=dataclasses.replace(
                base.model,
                transformer_scan_unroll=unroll,
                cnn_scan_unroll=cnn_unroll,
                transformer_remat=tr_remat,
                cnn_remat=cnn_remat,
                transformer_dropout_rate=(
                    base.model.transformer_dropout_rate if dropout else 0.0
                ),
                fast_dropout_rng=fastdrop,
                cnn_bwd_kernel=cnn_bwdk,
                **({"attention_impl": impl} if impl else {}),
            ),
            train=dataclasses.replace(
                base.train, minibatch_size_per_device=mb,
                fused_flat_optimizer=fusedopt,
            ),
        )
        params = shard_params(jax.tree.map(jnp.asarray, params_host), mesh)
        tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
        opt = jax.vmap(tx.init)(params)
        step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
        amb = reshape_to_minibatches(audio, mb)
        lmb = reshape_to_minibatches(labels, mb)
        st = {"p": params, "o": opt}

        def one():
            out = step(st["p"], st["o"], amb, lmb, key, scale)
            st["p"], st["o"] = out.params, out.opt_state
            return out.loss

        try:
            jax.block_until_ready(one()); jax.block_until_ready(one())
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = one()
                jax.block_until_ready(out)
                times.append((time.perf_counter() - t0) / args.iters * 1e3)
            ms = sorted(times)[1]
        except Exception as e:
            results[token] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            print(f"{token}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        results[token] = {
            "ms": round(ms, 2),
            "steps_per_s": round(1e3 / ms, 2),
            "train_audio_sec_per_s": round(1e3 / ms * args.batch * 5.0, 1),
        }
        print(f"{token}: {ms:.2f} ms ({1e3/ms:.2f} steps/s)", flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
