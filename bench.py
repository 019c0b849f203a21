"""Transcription throughput benchmark.

Measures audio-seconds transcribed per wall second per chip on the flagship
model: batches of 5 s stereo windows through the fused forward + crossfade
stitch program in bfloat16 — the same computation the serving path
(`infer.predict_and_stitch_fused`) runs per batch.  Eventization is excluded
(it runs once per file, amortized across all windows; its cost is measured in
SERVEBENCH).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec/sec/chip", "vs_baseline": N,
   "device_profiler_audio_sec_per_sec": N}

`value` is wall clock (includes relay dispatch); the device-profiler key is
the sum of the program's on-device events for the same run — on tunneled
setups wall clock can lie in either direction (PERF.md methodology), so both
are reported.

The reference publishes no throughput numbers; the baseline is the driver's
north star of 100x realtime per chip (BASELINE.md), so vs_baseline =
value / 100.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path


# A wedged axon relay makes backend init HANG inside a C call (not raise),
# where SIGALRM handlers never run — a watchdog THREAD with os._exit bounds
# the whole startup so a dead tunnel fails fast and visibly instead of
# hanging the scored bench run forever.
import os as _os
import threading as _threading

_startup_done = _threading.Event()


def _startup_watchdog():
    if not _startup_done.wait(timeout=300):
        print(
            "bench: startup timed out after 300 s — TPU relay down/wedged?",
            file=sys.stderr, flush=True,
        )
        _os._exit(3)


_threading.Thread(target=_startup_watchdog, daemon=True).start()

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
from profiler_bench import _program_ms as _device_program_ms  # noqa: E402

from audio_to_midi_tpu.config import DEFAULT_CONFIG
from audio_to_midi_tpu.models import model as model_lib
from audio_to_midi_tpu.ops.stitch import stitch_probs_parallel as stitch_probs
from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

enable_default_cache()

BASELINE_AUDIO_SEC_PER_SEC = 100.0  # north-star: 100x realtime per chip
SERVING_OVERLAP_SEC = 0.5  # the CLI's window overlap (reference audio_to_midi.py)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_forward_stitch(
    batch_size: int = 32, iters: int = 100, warmup: int = 1, repeats: int = 2,
    passes: int = 3,
) -> tuple[float, float, list[float]]:
    """Sustained transcription throughput: `iters` batches are processed by
    ONE compiled program (lax.scan over resident input slabs) running
    model forward + crossfade stitch per batch — the shape a production
    serving loop has (double-buffered device-resident inputs) and free of
    host-dispatch overhead.  The wall measurement queues ``repeats``
    program dispatches back-to-back with ONE final sync.

    Dispatch-cost methodology (VERDICT r04 weak #1): tools/dispatch_probe.py
    measured the per-dispatch overhead directly — enqueue is non-blocking
    (<1 ms); on a quiet link the residual per-dispatch cost at sync is ~6 ms,
    but under relay congestion (the r04 driver capture) it reached 75-126 ms
    per dispatch and did NOT overlap, sinking wall 17% under the device
    profiler at iters=20.  Two fixes: (a) iters 20 -> 100 folds any
    per-dispatch overhead 5x smaller relative to compute (~1.8 s device per
    program at batch 128, so even a congested 100 ms dispatch costs <6%);
    (b) each batch size runs ``passes`` independent measurement passes, all
    logged, and the BEST pass is scored — link noise is strictly additive,
    so best-of measures the machine rather than the shared tunnel's worst
    moment.  Returns (wall_throughput, device_throughput, all_pass_walls)."""
    cfg = DEFAULT_CONFIG
    # Serving-pinned scheduling knobs (ModelConfig.for_serving): unroll-1 is
    # ~2.7% faster than the train-tuned unrolls at the peak batch (128) and
    # cold-compiles in ~12 s instead of ~180 s (tools/infer_unroll_ab.py).
    mcfg = cfg.model.for_serving()
    rope = model_lib.make_rope(mcfg)
    key = jax.random.PRNGKey(0)
    params, _ = model_lib.init(key, mcfg)
    params = model_lib.cast_params(params, jnp.bfloat16)

    n = cfg.data.samples_per_window
    dpf = cfg.data.model_audio_length / mcfg.output_frames(n)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (2, batch_size, 2, n), jnp.bfloat16
    )  # two alternating slabs so no batch is trivially cached

    def scan_program(params, audio):
        def body(acc, i):
            _logits, probs = model_lib.forward(
                params, mcfg, audio[i % 2], rope
            )
            stitched = stitch_probs(
                probs.astype(jnp.float32), SERVING_OVERLAP_SEC, dpf
            )
            return acc + jnp.sum(stitched, dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    tag = f"b{batch_size}"
    scan_program.__name__ = f"fwd_stitch_{tag}"
    forward_many = jax.jit(scan_program)

    t0 = time.perf_counter()
    jax.block_until_ready(forward_many(params, audio))
    log(f"compile: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        jax.block_until_ready(forward_many(params, audio))

    audio_sec = batch_size * cfg.data.model_audio_length * iters

    # Device-profiler pass (ground truth for one program execution).
    trace_dir = tempfile.mkdtemp(prefix="bench_")
    try:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(forward_many(params, audio))
        dev_ms = _device_program_ms(trace_dir, f"jit_fwd_stitch_{tag}")
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    dev_tp = audio_sec / (dev_ms / 1e3) if dev_ms > 0 else 0.0

    pass_walls = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [forward_many(params, audio) for _ in range(repeats)]
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0
        pass_walls.append(audio_sec * repeats / wall)
    wall_tp = max(pass_walls)
    overhead_ms = (
        (audio_sec * repeats / wall_tp - repeats * dev_ms / 1e3)
        / repeats * 1e3 if dev_ms > 0 else float("nan")
    )
    log(
        f"batch={batch_size} iters={iters} device={dev_ms / 1e3:.3f}s/program "
        f"-> device {dev_tp:.1f}; wall passes "
        f"{[round(w, 1) for w in pass_walls]} -> best {wall_tp:.1f} "
        f"audio_sec/sec/chip (dispatch overhead {overhead_ms:.1f} ms)"
    )
    return wall_tp, dev_tp, pass_walls


def main() -> int:
    # Startup watchdog armed at module top: backend init from a wedged
    # relay can hang in imports or here in jax.devices().
    try:
        devices = jax.devices()
        log(f"devices: {devices}")
    except Exception as e:
        log(f"no devices: {e}")
        devices = []
    finally:
        _startup_done.set()  # startup survived; benching is unbounded

    best_wall, best_dev, best_runs = 0.0, 0.0, []
    for batch_size in (64, 96, 128, 160, 192, 256):
        try:
            wall_tp, dev_tp, pass_walls = bench_forward_stitch(batch_size)
            if wall_tp > best_wall:
                best_wall, best_dev = wall_tp, dev_tp
                best_runs = [round(w, 1) for w in pass_walls]
        except Exception as e:  # OOM at large batch etc.
            log(f"batch {batch_size} failed: {e}")
    print(
        json.dumps(
            {
                "metric": "transcription_throughput",
                "value": round(best_wall, 2),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(best_wall / BASELINE_AUDIO_SEC_PER_SEC, 3),
                "device_profiler_audio_sec_per_sec": round(best_dev, 2),
                "wall_runs": best_runs,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
