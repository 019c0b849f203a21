"""Transcription throughput benchmark.

Measures audio-seconds transcribed per wall second per chip on the flagship
model: batches of 5 s stereo windows through the fused forward(+stitch)
program in bfloat16.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers; the baseline is the driver's
north star of 100x realtime per chip (BASELINE.md), so vs_baseline =
value / 100.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from audio_to_midi_tpu.config import DEFAULT_CONFIG
from audio_to_midi_tpu.models import model as model_lib

BASELINE_AUDIO_SEC_PER_SEC = 100.0  # north-star: 100x realtime per chip


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_forward(batch_size: int = 32, iters: int = 20, warmup: int = 2) -> float:
    """Sustained transcription throughput: `iters` batches are processed by
    ONE compiled program (lax.scan over resident input slabs), the shape a
    production serving loop has (double-buffered device-resident inputs) —
    and free of host-dispatch overhead, which on tunneled TPU setups
    otherwise dominates."""
    cfg = DEFAULT_CONFIG
    rope = model_lib.make_rope(cfg.model)
    key = jax.random.PRNGKey(0)
    params, _ = model_lib.init(key, cfg.model)
    params = model_lib.cast_params(params, jnp.bfloat16)

    n = cfg.data.samples_per_window
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (2, batch_size, 2, n), jnp.bfloat16
    )  # two alternating slabs so no batch is trivially cached

    @jax.jit
    def forward_many(params, audio):
        def body(acc, i):
            _logits, probs = model_lib.forward(
                params, cfg.model, audio[i % 2], rope
            )
            return acc + jnp.sum(probs, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return acc

    t0 = time.perf_counter()
    jax.block_until_ready(forward_many(params, audio))
    log(f"compile: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        jax.block_until_ready(forward_many(params, audio))

    t0 = time.perf_counter()
    out = forward_many(params, audio)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_sec = batch_size * cfg.data.model_audio_length * iters
    throughput = audio_sec / dt
    log(
        f"batch={batch_size} iters={iters} wall={dt:.3f}s "
        f"-> {throughput:.1f} audio_sec/sec/chip ({throughput:.1f}x realtime)"
    )
    return throughput


def main() -> int:
    try:
        devices = jax.devices()
        log(f"devices: {devices}")
    except Exception as e:
        log(f"no devices: {e}")
        devices = []

    best = 0.0
    for batch_size in (64, 96, 128, 160, 192, 256):
        try:
            best = max(best, bench_forward(batch_size))
        except Exception as e:  # OOM at large batch etc.
            log(f"batch {batch_size} failed: {e}")
    print(
        json.dumps(
            {
                "metric": "transcription_throughput",
                "value": round(best, 2),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(best / BASELINE_AUDIO_SEC_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
