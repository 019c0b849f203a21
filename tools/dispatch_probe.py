"""Probe the axon-relay dispatch cost for the serving bench (VERDICT r04 #1).

BENCH_r04 showed wall throughput ~17% under the device profiler at batch 128
despite pipelined back-to-back dispatch (4 repeats, one final sync): ~75-126 ms
per dispatch did NOT overlap.  This probe times each repeat's ENQUEUE
(the non-blocking jit call) and the final sync separately, at several
in-program iteration counts, to pin where the overhead lives:

  * enqueue ~free, sync ~= device*repeats + overhead*repeats
      -> the relay SERIALIZES executions (overhead per execute is real;
         amortize with more in-program iters)
  * enqueue ~overhead each
      -> the client blocks per call (dispatch is synchronous over the tunnel)

Usage: python tools/dispatch_probe.py [--batch 128] [--repeats 4]
Writes one JSON line per (iters, pass) to stdout.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from profiler_bench import _program_ms  # noqa: E402

from audio_to_midi_tpu.config import DEFAULT_CONFIG
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.ops.stitch import stitch_probs_parallel as stitch_probs
from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

enable_default_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--iters", type=int, nargs="+", default=[20, 50, 100])
    args = p.parse_args()

    cfg = DEFAULT_CONFIG
    rope = model_lib.make_rope(cfg.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    params = model_lib.cast_params(params, jnp.bfloat16)
    n = cfg.data.samples_per_window
    dpf = cfg.data.model_audio_length / cfg.model.output_frames(n)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (2, args.batch, 2, n), jnp.bfloat16
    )

    for iters in args.iters:
        def scan_program(params, audio, iters=iters):
            def body(acc, i):
                _l, probs = model_lib.forward(params, cfg.model, audio[i % 2], rope)
                st = stitch_probs(probs.astype(jnp.float32), 0.5, dpf)
                return acc + jnp.sum(st, dtype=jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return acc

        tag = f"probe_b{args.batch}_i{iters}"
        scan_program.__name__ = tag
        fn = jax.jit(scan_program)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, audio))
        log(f"iters={iters} compile {time.perf_counter() - t0:.1f}s")
        jax.block_until_ready(fn(params, audio))  # warm

        # Device-profiler ground truth for one program execution.
        td = tempfile.mkdtemp(prefix="probe_")
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(params, audio))
            dev_ms = _program_ms(td, f"jit_{tag}")
        finally:
            shutil.rmtree(td, ignore_errors=True)

        audio_sec = args.batch * cfg.data.model_audio_length * iters
        for pss in range(args.passes):
            enq = []
            t_start = time.perf_counter()
            outs = []
            for _ in range(args.repeats):
                t1 = time.perf_counter()
                outs.append(fn(params, audio))
                enq.append(time.perf_counter() - t1)
            t_sync = time.perf_counter()
            jax.block_until_ready(outs)
            t_end = time.perf_counter()
            wall = t_end - t_start
            rec = {
                "iters": iters,
                "pass": pss,
                "enqueue_ms": [round(e * 1e3, 1) for e in enq],
                "sync_ms": round((t_end - t_sync) * 1e3, 1),
                "wall_s": round(wall, 3),
                "device_ms_per_program": round(dev_ms, 1),
                "device_s_total": round(dev_ms * args.repeats / 1e3, 3),
                "overhead_ms_per_dispatch": round(
                    (wall - dev_ms * args.repeats / 1e3) / args.repeats * 1e3, 1
                ),
                "wall_tp": round(audio_sec * args.repeats / wall, 1),
                "dev_tp": round(audio_sec / (dev_ms / 1e3), 1),
            }
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
