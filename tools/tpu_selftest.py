"""On-device kernel parity self-test.

The pytest suite runs every Pallas kernel in interpret mode on a virtual CPU
platform; this tool runs the same parity checks against the REAL compiled
Mosaic kernels on the current TPU, at the production geometry — catching any
compiled-vs-interpreted divergence (tiling, masked lanes, integer-division
semantics, fp accumulation order).

Usage: python tools/tpu_selftest.py   (exits non-zero on any mismatch)
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def check(name: str, got, want, tol: float) -> bool:
    import numpy as np

    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = float(np.max(np.abs(want))) + 1e-9
    err = float(np.max(np.abs(got - want))) / scale
    ok = err <= tol
    print(f"{'OK ' if ok else 'FAIL'} {name:52s} rel_err={err:.3e} (tol {tol:g})", flush=True)
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.models.attention import (
        local_self_attention,
        self_attention,
    )
    from audio_to_midi_tpu.models.convnext import cnn_forward
    from audio_to_midi_tpu.models.transformer import transformer_stack

    print(f"devices: {jax.devices()}", flush=True)
    cfg = Config().model
    rope = model_lib.make_rope(cfg)
    params, _ = model_lib.init(jax.random.PRNGKey(0), cfg)
    ok = True

    # bf16 (the serving dtype) and f32 (the checkpoint-parity dtype).
    for dtype, tol in ((jnp.float32, 3e-5), (jnp.bfloat16, 4e-2)):
        p = model_lib.cast_params(params, dtype)
        tag = jnp.dtype(dtype).name
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 250, 256), dtype)
        xla = dataclasses.replace(cfg, attention_impl="xla", cnn_impl="xla")

        att = jax.tree.map(lambda t: t[0], p["transformer"])["local"]["attention"]
        a = jax.jit(lambda x: local_self_attention(x, att, rope, xla))(x)
        for impl in ("pallas", "pallas_block"):
            c = dataclasses.replace(cfg, attention_impl=impl)
            b = jax.jit(lambda x, c=c: local_self_attention(x, att, rope, c))(x)
            ok &= check(f"local attention {impl} [{tag}]", b, a, tol)

        a = jax.jit(lambda x: self_attention(x, att, rope, xla))(x)
        c = dataclasses.replace(cfg, attention_impl="pallas")
        b = jax.jit(lambda x: self_attention(x, att, rope, c))(x)
        ok &= check(f"global attention pallas [{tag}]", b, a, tol)

        tp = p["transformer"]
        a = jax.jit(lambda x: transformer_stack(x, tp, rope, xla))(x)
        for impl in ("pallas", "pallas_pair", "pallas_fused"):
            c = dataclasses.replace(cfg, attention_impl=impl)
            b = jax.jit(lambda x, c=c: transformer_stack(x, tp, rope, c))(x)
            ok &= check(f"transformer stack {impl} [{tag}]", b, a, tol)

        audio = jax.random.normal(jax.random.PRNGKey(2), (8, 80000, 2), dtype)
        a = jax.jit(lambda x: cnn_forward(x, p["cnn"], xla))(audio)
        for impl in ("pallas", "pallas_stage"):
            c = dataclasses.replace(cfg, cnn_impl=impl)
            b = jax.jit(lambda x, c=c: cnn_forward(x, p["cnn"], c))(audio)
            ok &= check(f"cnn {impl} [{tag}]", b, a, tol)

        # full forward, default config (production path)
        raw = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 80000), dtype)
        a = jax.jit(lambda r: model_lib.forward(p, xla, r, rope)[0])(raw)
        b = jax.jit(lambda r: model_lib.forward(p, cfg, r, rope)[0])(raw)
        ok &= check(f"full forward default-vs-xla [{tag}]", b, a, tol)

    print("SELFTEST " + ("PASSED" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
