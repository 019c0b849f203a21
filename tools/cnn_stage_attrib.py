"""Per-stage CNN grad attribution by prefix differencing (VERDICT r04 #4).

CNNBWD.json established: remat recompute = 0.57 ms of the 10.6 ms cnn grad
(mb=32), depthwise-conv grads are trivial (0.013-0.02 ms per stage), and the
op trace is ~hundreds of ~0.035 ms bandwidth-bound fusions.  This tool
attributes the grad per STAGE: it times jax.grad of the CNN truncated to its
first k stages (k = 1..7, identical routing to cnn_forward — packed
space-to-depth for the eligible small-C stages, scan+remat per stage) and
reports successive differences.  Every stage carries the same activation
volume (L x C == 64000 per sample at every stage), so differences isolate
per-stage op-structure cost, with stage 5 (C=128, L=500, depth 21) expected
to dominate.

Writes CNNSTAGE.json.  Usage: python tools/cnn_stage_attrib.py [--mb 32]
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
    p.add_argument("--out", default="CNNSTAGE.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    from profiler_bench import _program_ms

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import model as model_lib, nn
    from audio_to_midi_tpu.models.convnext import cnn_forward

    cfg = Config()
    full_params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    full_params = model_lib.cast_params(full_params, jnp.bfloat16)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.mb, cfg.data.samples_per_window, 2),
        jnp.bfloat16,
    )
    results: dict = {}

    def measure(tag, program, *operands):
        program.__name__ = f"cnnstage_{tag}"
        fn = jax.jit(program)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*operands))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*operands))
        td = tempfile.mkdtemp(prefix="cnnstage_")
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*operands))
            dev_ms = _program_ms(td, f"jit_cnnstage_{tag}")
        finally:
            shutil.rmtree(td, ignore_errors=True)
        per_iter = dev_ms / args.iters
        results[tag] = round(per_iter, 3)
        print(f"{tag}: {per_iter:.3f} ms/iter (compile {compile_s:.0f}s)",
              flush=True)
        return per_iter

    prev = 0.0
    per_stage = {}
    for k in range(1, len(cfg.model.dims) + 1):
        mcfg = dataclasses.replace(
            cfg.model,
            dims=cfg.model.dims[:k],
            depths=cfg.model.depths[:k],
        )
        params = {
            "stages": [
                jax.tree.map(lambda x: x, s)
                for s in full_params["cnn"]["stages"][:k]
            ],
            "final_norm": jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                nn.init_layer_norm(cfg.model.dims[k - 1]),
            ),
        }

        def cnn_loss(p, a):
            return jnp.sum(cnn_forward(a, p, mcfg).astype(jnp.float32))

        def prog(p, a):
            def body(acc, i):
                g = jax.grad(cnn_loss)(p, a + i.astype(a.dtype) * 1e-8)
                leaves = [
                    jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)
                ]
                return acc + jnp.sum(jnp.array(leaves)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return out

        ms = measure(f"prefix_{k}", prog, params, audio)
        dims_k = cfg.model.dims[k - 1]
        per_stage[f"stage_{k - 1}_c{dims_k}_d{cfg.model.depths[k - 1]}"] = round(
            ms - prev, 3
        )
        prev = ms

    results["per_stage_ms"] = per_stage
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
