"""CNN backward attribution (VERDICT r04 #4).

TRAINACCT_r04: cnn_grad (mb=32) = 12.4 ms — half the grad time — with no
per-op attribution.  This tool gives the CNN the treatment the transformer
got in TR_SWEEP:

  1. cnn_grad at remat on/off (the remat recompute share);
  2. device-trace op attribution of the cnn-grad program (depthwise convs
     vs pointwise matmuls vs LN/elementwise fusions vs copies), via
     profile_forward.parse_xplane;
  3. isolated depthwise-conv grad micro-benchmarks at each natural-stage
     geometry, XLA conv formulation vs a matmul (shift-and-stack)
     reformulation of the SAME arithmetic — the backward candidate:
     dgrad(depthwise k=7) = depthwise conv with a flipped kernel;
     wgrad = per-channel correlation, which XLA lowers as a grouped conv
     with C groups (historically weak) while the shift-stack form is one
     (K, B*L) x (B*L, C)-shaped contraction per tap batch.

Writes CNNBWD.json.  Usage: python tools/cnn_bwd_accounting.py [--mb 32]
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
    p.add_argument("--out", default="CNNBWD.json")
    p.add_argument("--top", type=int, default=24)
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    from profile_forward import parse_xplane
    from profiler_bench import _program_ms

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.models.convnext import cnn_forward

    cfg = Config()
    results: dict = {}

    def measure(tag, program, *operands, parse=False):
        program.__name__ = f"cnnbwd_{tag}"
        fn = jax.jit(program)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*operands))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*operands))
        td = tempfile.mkdtemp(prefix="cnnbwd_")
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*operands))
            dev_ms = _program_ms(td, f"jit_cnnbwd_{tag}")
            ops = parse_xplane(td, top=args.top) if parse else None
        finally:
            shutil.rmtree(td, ignore_errors=True)
        per_iter = dev_ms / args.iters
        results[tag] = round(per_iter, 3)
        print(f"{tag}: {per_iter:.3f} ms/iter (compile {compile_s:.0f}s)",
              flush=True)
        return ops

    # ------------------------------------------------------------------
    # 1+2. full CNN grad, remat on/off, with op attribution on the default
    # ------------------------------------------------------------------
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg.model)
    params = model_lib.cast_params(params, jnp.bfloat16)
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.mb, cfg.data.samples_per_window, 2),
        jnp.bfloat16,
    )

    for tag, remat in (("cnn_grad_remat", True), ("cnn_grad_noremat", False)):
        mcfg = dataclasses.replace(cfg.model, cnn_remat=remat)

        def cnn_loss(p, a):
            return jnp.sum(
                cnn_forward(a, p["cnn"], mcfg).astype(jnp.float32)
            )

        def prog(p, a):
            def body(acc, i):
                g = jax.grad(cnn_loss)(p, a + i.astype(a.dtype) * 1e-8)
                leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)]
                return acc + jnp.sum(jnp.array(leaves)), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return out

        ops = measure(tag, prog, params, audio, parse=(tag == "cnn_grad_remat"))
        if ops:
            results["op_attribution"] = [
                {"op": name[:90], "ms": round(ms / args.iters, 3)}
                for name, ms in ops
            ]

    # ------------------------------------------------------------------
    # 3. depthwise grad micro-bench per natural-stage geometry
    #    (stages with C >= 64 run natural; C,L from the default geometry)
    # ------------------------------------------------------------------
    geoms = []
    length = cfg.data.samples_per_window // 5
    for i, c in enumerate(cfg.model.dims):
        if i > 0:
            length //= 2
        if c >= 64:
            geoms.append((c, length, cfg.model.depths[i]))

    for c, l, depth in geoms:
        x = jax.random.normal(jax.random.PRNGKey(2), (args.mb, l, c), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(3), (7, 1, c), jnp.bfloat16)

        def conv_loss(w, x):
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=c,
            )
            return jnp.sum(y.astype(jnp.float32))

        def prog(w, x):
            def body(acc, i):
                gw, gx = jax.grad(conv_loss, argnums=(0, 1))(
                    w, x + i.astype(x.dtype) * 1e-8
                )
                return acc + jnp.sum(gw.astype(jnp.float32)) + jnp.sum(
                    gx.astype(jnp.float32)
                ), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return out

        measure(f"dwgrad_conv_c{c}_l{l}", prog, w, x)

        # matmul (shift-stack) formulation of the same depthwise conv:
        # y[:, t, c] = sum_k w[k, c] * x[:, t + k - 3, c] — K shifted copies
        # elementwise-weighted and summed; autodiff gives the matching
        # backward out of plain adds/muls (MXU-free but fully fused).
        def conv_loss_shift(w, x):
            acc = jnp.zeros_like(x)
            for k in range(7):
                shifted = jnp.roll(x, 3 - k, axis=1)
                # SAME zero padding: zero out rolled-in rows
                t = jnp.arange(x.shape[1])
                valid = (t >= (3 - k)) & (t < x.shape[1] + (3 - k))
                shifted = jnp.where(valid[None, :, None], shifted, 0)
                acc = acc + shifted * w[k, 0][None, None, :]
            return jnp.sum(acc.astype(jnp.float32))

        def prog2(w, x):
            def body(acc, i):
                gw, gx = jax.grad(conv_loss_shift, argnums=(0, 1))(
                    w, x + i.astype(x.dtype) * 1e-8
                )
                return acc + jnp.sum(gw.astype(jnp.float32)) + jnp.sum(
                    gx.astype(jnp.float32)
                ), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return out

        measure(f"dwgrad_shift_c{c}_l{l}", prog2, w, x)

    out_path = Path(args.out)
    out_path.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
