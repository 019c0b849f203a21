"""A/B the scan-unroll / remat knobs on the SERVING path (bench.py program).

The round-4 knobs (cnn_scan_unroll=21, transformer_scan_unroll=8,
transformer_remat=False) were chosen by A/B on the TRAINING step; bench.py
inherits them through DEFAULT_CONFIG.  This measures whether they help or
hurt pure inference so serving can pin its own values if they differ.
Prints one JSON object {config_name: device_ms}.
"""

from __future__ import annotations

import dataclasses
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

import os
BATCH = int(os.environ.get("AB_BATCH", "256"))
ITERS = 20


def bench(tag: str, mcfg) -> tuple[float, float]:
    cfg = DEFAULT_CONFIG
    rope = model_lib.make_rope(mcfg)
    params, _ = model_lib.init(jax.random.PRNGKey(0), mcfg)
    params = model_lib.cast_params(params, jnp.bfloat16)
    n = cfg.data.samples_per_window
    dpf = cfg.data.model_audio_length / mcfg.output_frames(n)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (2, BATCH, 2, n), jnp.bfloat16
    )

    def scan_program(params, audio):
        def body(acc, i):
            _l, probs = model_lib.forward(params, mcfg, audio[i % 2], rope)
            st = stitch_probs(probs.astype(jnp.float32), 0.5, dpf)
            return acc + jnp.sum(st, dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    scan_program.__name__ = f"ab_b{BATCH}_{tag}"
    fn = jax.jit(scan_program)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(params, audio))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        jax.block_until_ready(fn(params, audio))
    trace_dir = tempfile.mkdtemp(prefix="ab_")
    try:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(fn(params, audio))
        dev_ms = _program_ms(trace_dir, f"jit_ab_b{BATCH}_{tag}")
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    audio_sec = BATCH * cfg.data.model_audio_length * ITERS
    tp = audio_sec / (dev_ms / 1e3) if dev_ms > 0 else 0.0
    print(
        f"{tag}: device {dev_ms:.1f} ms -> {tp:.0f} audio-s/s "
        f"(compile {compile_s:.0f}s)",
        file=sys.stderr, flush=True,
    )
    return dev_ms, tp


def main():
    base = DEFAULT_CONFIG.model
    results = {}
    for tag, mcfg in [
        ("r4_defaults", base),
        ("unroll1", dataclasses.replace(
            base, cnn_scan_unroll=1, transformer_scan_unroll=1)),
        ("cnn1_tr8", dataclasses.replace(base, cnn_scan_unroll=1)),
        ("cnn21_tr1", dataclasses.replace(base, transformer_scan_unroll=1)),
    ]:
        dev_ms, tp = bench(tag, mcfg)
        results[tag] = {"device_ms": round(dev_ms, 2),
                        "audio_s_per_s": round(tp, 1)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
