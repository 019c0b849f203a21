"""Targeted sweep of the transformer fwd+bwd cost (the train step's measured
elephant: ~5.5-7.7 ms per minibatch-8 for ~5% of the FLOPs, TRAINACCT r4).

Grid: {remat on/off} x {scan unroll 1/2/8} x {attention_impl pallas/xla} x
{mb 8/16}, loss = BCE over transformer_stack + decoder on a precomputed CNN
output.  Also re-times the FULL train step for the most promising configs.

Usage: python tools/tr_bwd_sweep.py [--iters 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn, iters: int, repeats: int = 3) -> float:
    import jax

    jax.block_until_ready(fn())
    jax.block_until_ready(fn())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return sorted(times)[len(times) // 2]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--out", default="TR_SWEEP.json")
    p.add_argument("--steps", action="store_true", help="also time full steps")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.models.model import decoder
    from audio_to_midi_tpu.models.transformer import transformer_stack
    from audio_to_midi_tpu.train.loss import sigmoid_bce_sum

    base = Config()
    rope = model_lib.make_rope(base.model)
    params, _ = model_lib.init(jax.random.PRNGKey(0), base.model)
    results = {}

    for mb in (8,):
        seq = 250
        h0 = jax.random.normal(
            jax.random.PRNGKey(1), (mb, seq, base.model.transformer_hidden_dim),
            jnp.bfloat16,
        )
        labels = (
            jax.random.uniform(jax.random.PRNGKey(2), (mb, seq, 90)) > 0.95
        ).astype(jnp.float32)

        for impl in ("pallas", "xla", "pallas_pair", "pallas_fused"):
            for remat in (True, False):
                for unroll in (1, 8):
                    mcfg = dataclasses.replace(
                        base.model,
                        attention_impl=impl,
                        transformer_remat=remat,
                        transformer_scan_unroll=unroll,
                        transformer_dropout_rate=0.0,
                    )

                    def tr_loss(p, h, l):
                        y = transformer_stack(
                            h,
                            jax.tree.map(
                                lambda x: x.astype(jnp.bfloat16), p["transformer"]
                            ),
                            rope, mcfg,
                        )
                        logits, _ = decoder(
                            y,
                            jax.tree.map(
                                lambda x: x.astype(jnp.bfloat16), p["decoder"]
                            ),
                        )
                        return jnp.mean(sigmoid_bce_sum(logits.astype(jnp.float32), l))

                    g = jax.jit(lambda p, h, l: jax.value_and_grad(tr_loss)(p, h, l))
                    name = f"tr_grad_mb{mb}_{impl}_{'remat' if remat else 'noremat'}_u{unroll}"
                    try:
                        ms = _timed(lambda: g(params, h0, labels), args.iters)
                    except Exception as e:
                        results[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
                        print(f"{name}: FAILED {type(e).__name__}", flush=True)
                        continue
                    results[name] = round(ms, 3)
                    print(f"{name}: {ms:.3f} ms", flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
