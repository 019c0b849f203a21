"""Capture a jax.profiler trace of the forward pass (or train step) on the
current backend and print the top ops by self time.

Usage: python tools/profile_forward.py [--batch 128] [--train] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_xplane(trace_dir: str, top: int = 40):
    """Aggregate device-event durations by op name from a chrome trace."""
    import json

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz files found under", trace_dir)
        return
    for f in files:
        trace = json.loads(gzip.decompress(Path(f).read_bytes()))
        events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
        # Identify device (TPU) process ids by name metadata.
        device_pids = set()
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                name = ev.get("args", {}).get("name", "")
                if "TPU" in name or "/device" in name.lower():
                    device_pids.add(ev.get("pid"))
        totals: dict[str, float] = defaultdict(float)
        counts: dict[str, int] = defaultdict(int)
        for ev in events:
            if ev.get("ph") != "X":
                continue
            if device_pids and ev.get("pid") not in device_pids:
                continue
            name = ev.get("name", "?")
            totals[name] += ev.get("dur", 0) / 1000.0  # us -> ms
            counts[name] += 1
        if not totals:
            print("no complete events found in", f)
            continue
        print(f"\n=== {f} (pids={sorted(device_pids) or 'all'}) ===")
        ranked = sorted(totals.items(), key=lambda kv: -kv[1])
        total = sum(totals.values())
        print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
        for name, ms in ranked[:top]:
            print(f"{ms:10.3f} {100*ms/total:6.2f} {counts[name]:7d}  {name[:110]}")
        print(f"{total:10.3f} total (sum across trace lines; may overlap)")
        return ranked[:top]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--train", action="store_true")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--parse-only", default=None, help="parse an existing trace dir")
    args = p.parse_args()

    if args.parse_only:
        parse_xplane(args.parse_only, args.top)
        return 0

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="a2m_trace_")
    cfg = Config(
        train=TrainConfig(batch_size=args.batch, minibatch_size_per_device=8)
    )
    rope = model_lib.make_rope(cfg.model)

    if args.train:
        from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
        from audio_to_midi_tpu.train import (
            make_train_step,
            reshape_to_minibatches,
            setup_optimizers,
        )

        mesh = make_mesh(1)
        nf = cfg.model.output_frames(cfg.data.samples_per_window)
        params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
        params = shard_params(params, mesh)
        tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
        opt = shard_params(jax.vmap(tx.init)(params), mesh)
        step = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
        mb = min(
            cfg.train.minibatch_size_per_device * len(jax.devices()), args.batch
        )
        audio = jax.random.normal(
            jax.random.PRNGKey(1),
            (args.batch, 2, cfg.data.samples_per_window), jnp.float32,
        )
        labels = jnp.zeros((args.batch, nf, cfg.model.output_vocab), jnp.float32)
        amb = reshape_to_minibatches(audio, mb)
        lmb = reshape_to_minibatches(labels, mb)
        scale = jnp.asarray(1.0, cfg.precision.compute_dtype)
        out = step(params, opt, amb, lmb, jax.random.PRNGKey(2), scale)
        jax.block_until_ready(out.loss)  # compile #1
        # The updated params' sharding layout can differ from the initial
        # placement, triggering a second compile on the next call — warm it
        # too so the trace holds only steady-state steps.
        out = step(out.params, out.opt_state, amb, lmb, jax.random.PRNGKey(2), scale)
        jax.block_until_ready(out.loss)
        with jax.profiler.trace(trace_dir):
            for i in range(3):
                out = step(
                    out.params, out.opt_state, amb, lmb, jax.random.PRNGKey(3 + i), scale
                )
            jax.block_until_ready(out.loss)
    else:
        params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
        params = model_lib.cast_params(params, jnp.bfloat16)
        audio = jax.random.normal(
            jax.random.PRNGKey(1), (args.batch, 2, cfg.data.samples_per_window), jnp.bfloat16
        )

        @jax.jit
        def fwd(params, audio):
            return model_lib.forward(params, cfg.model, audio, rope)[1]

        jax.block_until_ready(fwd(params, audio))  # compile outside the trace
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = fwd(params, audio)
            jax.block_until_ready(out)
    print("trace written to", trace_dir)
    parse_xplane(trace_dir, args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
