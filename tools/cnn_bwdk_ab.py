"""Isolated A/B of the fused ConvNeXt stage backward kernel (VERDICT r04 #4).

Measures the full CNN grad at mb=32 (scan-serialized, device-profiled — the
CNNBWD.json methodology) with ModelConfig.cnn_bwd_kernel on vs off, plus the
eligible stages alone (5: C=128 d21, 6: C=256 d3).  Writes CNNBWDK_AB.json.

Usage: python tools/cnn_bwdk_ab.py [--mb 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="CNNBWDK_AB.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    from profiler_bench import _program_ms

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import convnext, model as model_lib
    from audio_to_midi_tpu.models.convnext import cnn_forward
    from audio_to_midi_tpu.ops.pallas_convnext_bwd import (
        _xla_scan,
        stage_blocks_fused_bwd,
    )

    cfg = Config()
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    params = model_lib.cast_params(params, jnp.bfloat16)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.mb, cfg.data.samples_per_window, 2),
        jnp.bfloat16,
    )
    results: dict = {}

    def measure(tag, program, *operands):
        program.__name__ = f"ab_{tag}"
        fn = jax.jit(program)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*operands))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*operands))
        td = tempfile.mkdtemp(prefix="cnnbwdk_")
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*operands))
            dev_ms = _program_ms(td, f"jit_ab_{tag}")
        finally:
            shutil.rmtree(td, ignore_errors=True)
        per_iter = dev_ms / args.iters
        results[tag] = round(per_iter, 3)
        print(f"{tag}: {per_iter:.3f} ms/iter (compile {compile_s:.0f}s)",
              flush=True)

    def scan_grad(loss):
        """Program scanning grad(loss)(p, x) with x perturbed per iteration
        so the grad cannot be hoisted out of the loop."""

        def prog(p, x):
            def body(acc, i):
                g = jax.grad(loss)(p, x + i.astype(x.dtype) * 1e-8)
                leaves = [
                    jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g)
                ]
                return acc + jnp.sum(jnp.array(leaves)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return out

        return prog

    # full CNN grad, kernel on/off
    for tag, bwdk in (("cnn_grad_kernel", True), ("cnn_grad_xla", False)):
        mcfg = dataclasses.replace(cfg.model, cnn_bwd_kernel=bwdk)

        def cnn_loss(p, a):
            return jnp.sum(cnn_forward(a, p["cnn"], mcfg).astype(jnp.float32))

        measure(tag, scan_grad(cnn_loss), params, audio)

    # eligible stages alone
    for si in (5, 6):
        c = cfg.model.dims[si]
        length = cfg.data.samples_per_window // 5 // (2 ** si)
        blocks = jax.tree.map(
            lambda x: x, params["cnn"]["stages"][si]["blocks"]
        )
        x = jax.random.normal(
            jax.random.PRNGKey(2), (args.mb, length, c), jnp.bfloat16
        )

        def k_loss(b, x):
            return jnp.sum(stage_blocks_fused_bwd(x, b).astype(jnp.float32))

        def x_loss(b, x):
            def body(carry, bp):
                return (
                    convnext.block(
                        carry, bp, sdd_rate=0.0, enable_sdd=False, key=None
                    ),
                    None,
                )

            out, _ = jax.lax.scan(body, x, b)
            return jnp.sum(out.astype(jnp.float32))

        measure(f"stage{si}_kernel", scan_grad(k_loss), blocks, x)
        measure(f"stage{si}_xla", scan_grad(x_loss), blocks, x)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
