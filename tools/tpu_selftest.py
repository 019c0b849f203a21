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
    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
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

    # bf16 (the serving dtype) and f32 (the checkpoint-parity dtype).  The
    # f32 leg runs under matmul precision 'highest': at DEFAULT, TPU XLA
    # *and* Mosaic both execute f32 dots as bf16 MXU passes (~4e-3 relative
    # drift on both sides — measured), which makes a 3e-5 parity comparison
    # meaningless; under 'highest' the two paths agree to ~2e-7.  This
    # mirrors production: f32 serving traces under 'highest'
    # (infer._parity_precision), bf16 serving at DEFAULT.
    import contextlib

    for dtype, tol in ((jnp.float32, 3e-5), (jnp.bfloat16, 4e-2)):
        prec = (
            jax.default_matmul_precision("highest")
            if dtype == jnp.float32
            else contextlib.nullcontext()
        )
        with prec:
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

    # ---- In-kernel PRNG dropout (TPU-only path; no interpret-mode twin) ----
    import numpy as np

    from audio_to_midi_tpu.ops import pallas_attention as pa

    if pa.prng_dropout_available():
        # f32 parity vs the XLA mirrors — same 'highest' rationale as above.
        prec = jax.default_matmul_precision("highest")
        with prec:
            b, p_len, heads, hd = 4, 256, 4, 64
            dm = heads * hd
            window, threshold = 16, pa.dropout_threshold(0.1)
            ks = jax.random.split(jax.random.PRNGKey(7), 6)
            qa, ka, qb, kb, v = (
                jax.random.normal(k, (b, p_len, dm), jnp.float32) for k in ks[:5]
            )
            seed = pa.seed_from_key(ks[5])

            out = jax.jit(
                lambda *a: pa.fused_local_two_phase_dropout_prng(
                    *a, heads, window, threshold
                )
            )(qa, ka, qb, kb, v, seed)
            out2 = jax.jit(
                lambda *a: pa.fused_local_two_phase_dropout_prng(
                    *a, heads, window, threshold
                )
            )(qa, ka, qb, kb, v, seed)
            ok &= check("prng two-phase deterministic", out2, out, 0.0)

            bits_a, bits_b = pa.dump_bits_two_phase(seed, b, heads, p_len)
            want = pa._two_phase_reference_bits(
                qa, ka, qb, kb, v, bits_a, bits_b, heads, window, threshold
            )
            ok &= check("prng two-phase fwd vs dumped-bits mirror", out, want, 3e-5)

            keep = float(jnp.mean(bits_a.astype(jnp.int32) >= threshold))
            ok &= check(
                "prng keep-rate", jnp.float32(keep),
                jnp.float32(1.0 - threshold / 256.0), 5e-3,
            )

            gfun = jax.jit(jax.grad(
                lambda *a: jnp.sum(
                    pa.fused_local_two_phase_dropout_prng(
                        *a, heads, window, threshold
                    ) ** 2
                ),
                argnums=(0, 1, 2, 3, 4),
            ))
            got_g = gfun(qa, ka, qb, kb, v, seed)
            want_g = jax.jit(jax.grad(
                lambda qa, ka, qb, kb, v: jnp.sum(
                    pa._two_phase_reference_bits(
                        qa, ka, qb, kb, v, bits_a, bits_b, heads, window, threshold
                    ) ** 2
                ),
                argnums=(0, 1, 2, 3, 4),
            ))(qa, ka, qb, kb, v)
            for name, gg, wg in zip("qa ka qb kb v".split(), got_g, want_g):
                ok &= check(f"prng two-phase grad d{name}", gg, wg, 1e-4)

            # Global (nhd) PRNG kernel vs its dumped-bits mirror + grads.
            s_len = 256
            q, k2, v2 = (
                jax.random.normal(kk, (b, s_len, dm), jnp.float32)
                for kk in jax.random.split(jax.random.PRNGKey(8), 3)
            )
            outn = jax.jit(
                lambda *a: pa.fused_attention_nhd_dropout_prng(
                    *a, heads, 0, threshold, 250
                )
            )(q, k2, v2, seed)
            bits_n = pa.dump_bits_nhd(seed, b, heads, s_len)
            wantn = pa._xla_reference_nhd_bits(
                q, k2, v2, bits_n, heads, 0, threshold, 250
            )
            ok &= check("prng nhd fwd vs dumped-bits mirror", outn, wantn, 3e-5)
            got_gn = jax.jit(jax.grad(
                lambda *a: jnp.sum(
                    pa.fused_attention_nhd_dropout_prng(
                        *a, heads, 0, threshold, 250
                    ) ** 2
                ),
                argnums=(0, 1, 2),
            ))(q, k2, v2, seed)
            want_gn = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    pa._xla_reference_nhd_bits(
                        q, k, v, bits_n, heads, 0, threshold, 250
                    ) ** 2
                ),
                argnums=(0, 1, 2),
            ))(q, k2, v2)
            for name, gg, wg in zip("q k v".split(), got_gn, want_gn):
                ok &= check(f"prng nhd grad d{name}", gg, wg, 1e-4)
    else:
        print("prng dropout unavailable on this backend — section skipped")

    print("SELFTEST " + ("PASSED" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
