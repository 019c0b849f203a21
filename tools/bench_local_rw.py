"""Measure the local-attention kernels on TPU: wide two-phase vs
reduced-width (per-window tiles), plus the dropout two-phase kernel —
device-profiler ms per invocation at the production geometry (PERF.md
methodology: only profiler sums are trustworthy over the relay).

Usage: python tools/bench_local_rw.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax.numpy as jnp

    from audio_to_midi_tpu.ops.pallas_attention import (
        dropout_threshold,
        fused_local_two_phase,
        fused_local_two_phase_dropout,
        fused_local_two_phase_rw,
    )
    from profiler_bench import bench_step

    b, p, heads, hd, window = args.batch, 256, 4, 64, 16
    dm = heads * hd
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x0 = tuple(jax.random.normal(k, (b, p, dm), dtype) for k in ks)
    # useful work: per (sample, phase, head): 2 * P * window * hd MACs
    useful = b * 2 * heads * 2 * 2 * p * window * hd
    # wide kernel actually computes 2 * P * P * hd MACs per core
    wide_flops = b * 2 * heads * 2 * 2 * p * p * hd

    def step_wide(c):
        qa, ka, qb, kb, v = c
        out = fused_local_two_phase(qa, ka, qb, kb, v, heads, window)
        return (ka, qb, kb, v, out)

    def step_rw(c):
        qa, ka, qb, kb, v = c
        out = fused_local_two_phase_rw(qa, ka, qb, kb, v, heads, window)
        return (ka, qb, kb, v, out)

    t = dropout_threshold(0.1)
    bits = jax.random.bits(jax.random.PRNGKey(9), (2, b, heads, p, p), jnp.uint8)

    def step_drop(c):
        qa, ka, qb, kb, v = c
        out = fused_local_two_phase_dropout(
            qa, ka, qb, kb, v, bits[0], bits[1], heads, window, t
        )
        return (ka, qb, kb, v, out)

    print(f"batch={b} P={p} heads={heads} hd={hd} window={window}", flush=True)
    ms_wide = bench_step("two_phase wide", step_wide, x0, iters=args.iters, flops=wide_flops)
    ms_rw = bench_step("two_phase reduced-width", step_rw, x0, iters=args.iters, flops=useful)
    ms_drop = bench_step("two_phase wide + dropout bits", step_drop, x0, iters=args.iters, flops=wide_flops)
    if ms_wide and ms_rw:
        print(f"rw / wide = {ms_rw / ms_wide:.2f}x", flush=True)
    if ms_wide and ms_drop:
        print(f"dropout / wide = {ms_drop / ms_wide:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
