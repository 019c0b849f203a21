"""Speed-of-light accounting of the training step (PERF.md round 4).

Decomposes the production train step (batch 64, default model, reference
semantics train.py:259-332) into measured components so the gap
between the step time and the chip's demonstrated forward MFU is attributed,
not guessed:

  * fwd            — batch_loss forward only, per minibatch
  * grad           — jit(value_and_grad(batch_loss)) per minibatch: the exact
                     scan-body unit (with / without dropout, with / without
                     block remat in the CNN + transformer scans)
  * cnn_grad       — value_and_grad of a sum-loss over cnn_forward only
  * tr_grad        — value_and_grad of BCE over transformer+decoder only
                     (CNN output precomputed)
  * opt            — optimizer chain alone (multi-transform AdamW + clip +
                     finite-guard + apply) on prebuilt grads
  * step           — the full train step at a (minibatch, dropout, remat)
                     grid, including minibatch sweeps (8/16/32/64) that trade
                     gradient-accumulation scan length for MXU utilization

--final re-measures the decomposition at the SHIPPED defaults (round-4
knobs locked by STEPTIME1-6: minibatch 32, scan unrolls, transformer remat
off, RBG dropout masks) -> TRAINACCT_r04.json for PERF.md's round-4 table.

Timing: N dispatches queued back-to-back, one block at the end (device work
serializes; the tunnel RTT is hidden by the dispatch pipeline), median of 3
repeats.  Writes TRAINACCT.json.

Usage: python tools/train_accounting.py [--batch 64] [--iters 20]
       [--quick] (fewer grid points)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn, iters: int, repeats: int = 3) -> float:
    """Median ms per call: queue ``iters`` dispatches, block once."""
    import jax

    out = fn()
    jax.block_until_ready(out)
    out = fn()
    jax.block_until_ready(out)
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--final", action="store_true",
        help="decompose at the SHIPPED config defaults (round-4 knobs: "
        "minibatch from TrainConfig, unrolls, remat split, fast dropout "
        "rng) instead of the round-3 exploration grid",
    )
    p.add_argument("--out", default="TRAINACCT.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step,
        reshape_to_minibatches,
        setup_optimizers,
    )
    from audio_to_midi_tpu.train.loss import batch_loss

    results: dict = {"batch": args.batch}
    base_cfg = Config(
        train=TrainConfig(batch_size=args.batch, minibatch_size_per_device=8)
    )
    rope = model_lib.make_rope(base_cfg.model)
    nf = base_cfg.model.output_frames(base_cfg.data.samples_per_window)
    mesh = make_mesh(1)

    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), base_cfg.model, 1)
    params = shard_params(params, mesh)
    params1 = jax.tree.map(lambda x: x[0], params)  # un-ensembled view

    audio = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.batch, 2, base_cfg.data.samples_per_window), jnp.float32,
    )
    labels = (
        jax.random.uniform(jax.random.PRNGKey(2), (args.batch, nf, 90)) > 0.95
    ).astype(jnp.float32)
    scale = jnp.asarray(1.0, jnp.bfloat16)
    key = jax.random.PRNGKey(3)

    def model_cfg(dropout: bool, remat: bool):
        m = base_cfg.model
        if args.final:
            # Keep every shipped default (unrolls, remat split, fast rng);
            # only the dropout toggle varies.
            return dataclasses.replace(
                m,
                transformer_dropout_rate=(
                    m.transformer_dropout_rate if dropout else 0.0
                ),
            )
        return dataclasses.replace(
            m,
            transformer_dropout_rate=m.transformer_dropout_rate if dropout else 0.0,
            cnn_remat=remat,
            transformer_remat=remat,
        )

    # ------------------------------------------------------------------
    # Per-minibatch units (the scan-body work item)
    # ------------------------------------------------------------------
    mb = TrainConfig().minibatch_size_per_device if args.final else 8
    a_mb, l_mb = audio[:mb], labels[:mb]

    def grad_fn(mcfg, dropout):
        f = jax.jit(
            lambda p, a, l, k: jax.value_and_grad(batch_loss)(
                p, mcfg, a, l, rope, scale, k if dropout else None,
                jnp.bfloat16, dropout,
            )
        )
        return lambda: f(params1, a_mb, l_mb, key)

    def fwd_fn(mcfg, dropout):
        f = jax.jit(
            lambda p, a, l, k: batch_loss(
                p, mcfg, a, l, rope, scale, k if dropout else None,
                jnp.bfloat16, dropout,
            )
        )
        return lambda: f(params1, a_mb, l_mb, key)

    if args.final:
        grid = [
            (f"fwd_mb{mb}_final", fwd_fn(model_cfg(False, True), False)),
            (f"fwd_mb{mb}_dropout_final", fwd_fn(model_cfg(True, True), True)),
            (f"grad_mb{mb}_final", grad_fn(model_cfg(False, True), False)),
            (f"grad_mb{mb}_dropout_final", grad_fn(model_cfg(True, True), True)),
        ]
    else:
        grid = [
            ("fwd_mb8", fwd_fn(model_cfg(False, True), False)),
            ("fwd_mb8_dropout", fwd_fn(model_cfg(True, True), True)),
            ("grad_mb8_remat", grad_fn(model_cfg(False, True), False)),
            ("grad_mb8_noremat", grad_fn(model_cfg(False, False), False)),
            ("grad_mb8_dropout_remat", grad_fn(model_cfg(True, True), True)),
            ("grad_mb8_dropout_noremat", grad_fn(model_cfg(True, False), True)),
        ]
    for name, fn in grid:
        ms = _timed(fn, args.iters)
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # Section-level grads (where inside the model the time goes)
    # ------------------------------------------------------------------
    from audio_to_midi_tpu.models.convnext import cnn_forward
    from audio_to_midi_tpu.models.model import decoder
    from audio_to_midi_tpu.models.transformer import transformer_stack
    from audio_to_midi_tpu.train.loss import sigmoid_bce_sum

    section_grid = (
        ((True, "final"),) if args.final else ((True, "remat"), (False, "noremat"))
    )
    for remat, tag in section_grid:
        mcfg = model_cfg(False, remat)

        def cnn_loss(p, a):
            x = jnp.transpose(a.astype(jnp.bfloat16), (0, 2, 1))  # NWC
            h = cnn_forward(
                x,
                jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["cnn"]),
                mcfg,
            )
            return jnp.sum(h.astype(jnp.float32) ** 2)

        cnn_g = jax.jit(lambda p, a: jax.value_and_grad(cnn_loss)(p, a))
        ms = _timed(lambda: cnn_g(params1, a_mb), args.iters)
        results[f"cnn_grad_mb{mb}_{tag}"] = round(ms, 3)
        print(f"cnn_grad_mb{mb}_{tag}: {ms:.3f} ms", flush=True)

        h0 = jax.jit(
            lambda p, a: cnn_forward(
                jnp.transpose(a.astype(jnp.bfloat16), (0, 2, 1)),
                jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["cnn"]),
                mcfg,
            )
        )(params1, a_mb)
        h0 = jax.block_until_ready(h0)

        def tr_loss(p, h, l):
            y = transformer_stack(
                h, jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["transformer"]),
                rope, mcfg,
            )
            logits, _ = decoder(
                y, jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["decoder"])
            )
            return jnp.mean(sigmoid_bce_sum(logits.astype(jnp.float32), l))

        tr_g = jax.jit(lambda p, h, l: jax.value_and_grad(tr_loss)(p, h, l))
        ms = _timed(lambda: tr_g(params1, h0, l_mb), args.iters)
        results[f"tr_grad_mb{mb}_{tag}"] = round(ms, 3)
        print(f"tr_grad_mb{mb}_{tag}: {ms:.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # Optimizer chain alone (ensemble vmap shape, as the step runs it)
    # ------------------------------------------------------------------
    tx, _ = setup_optimizers(params, base_cfg.model, base_cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    @jax.jit
    def opt_only(p, o, g):
        import optax

        def member(p, o, g):
            updates, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, updates), o2

        return jax.vmap(member)(p, o, g)

    grads = jax.tree.map(lambda x: (x * 1e-4).astype(jnp.float32), params)
    ms = _timed(lambda: opt_only(params, opt_state, grads), args.iters)
    results["opt_chain"] = round(ms, 3)
    print(f"opt_chain: {ms:.3f} ms", flush=True)

    # ------------------------------------------------------------------
    # Full train step grid: minibatch x dropout x remat
    # ------------------------------------------------------------------
    if args.final:
        # The shipped default step + its dropout-free twin, nothing else.
        step_grid = [(mb, True, True), (mb, False, True)]
    else:
        mbs = [8, 64] if args.quick else [8, 16, 32, 64]
        step_grid = []
        for mb_i in mbs:
            step_grid.append((mb_i, True, True))    # reference-parity default
            step_grid.append((mb_i, True, False))   # no remat
        if not args.quick:
            step_grid.append((8, False, True))      # dropout-free baselines
            step_grid.append((64, False, False))

    import numpy as np

    params_host = jax.tree.map(lambda x: np.asarray(x), params)

    for mb_i, dropout, remat in step_grid:
        cfg_i = dataclasses.replace(
            base_cfg,
            model=model_cfg(dropout, remat),
            train=dataclasses.replace(
                base_cfg.train, minibatch_size_per_device=mb_i
            ),
        )
        # Fresh placement per grid point: the step DONATES params/opt_state.
        p_i = shard_params(jax.tree.map(jnp.asarray, params_host), mesh)
        tx_i, _ = setup_optimizers(p_i, cfg_i.model, cfg_i.train, ensemble=True)
        opt_i = jax.vmap(tx_i.init)(p_i)
        step_fn = make_train_step(cfg_i, tx_i, rope, mesh=mesh, ensemble=True)
        amb = reshape_to_minibatches(audio, mb_i)
        lmb = reshape_to_minibatches(labels, mb_i)

        # Steady-state: params/opt donated; keep feeding the same arrays.
        state = {"p": p_i, "o": opt_i}

        def one():
            out = step_fn(state["p"], state["o"], amb, lmb, key, scale)
            state["p"], state["o"] = out.params, out.opt_state
            return out.loss

        name = f"step_mb{mb_i}" + ("_dropout" if dropout else "") + (
            "_final" if args.final else ("_remat" if remat else "_noremat")
        )
        try:
            ms = _timed(one, max(args.iters // 2, 5))
        except Exception as e:  # OOM at large minibatch is a finding, not a crash
            results[name] = f"failed: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            continue
        sps = 1e3 / ms
        results[name] = {
            "ms": round(ms, 2),
            "steps_per_s": round(sps, 2),
            "train_audio_sec_per_s": round(
                sps * args.batch * base_cfg.data.model_audio_length, 1
            ),
        }
        print(f"{name}: {ms:.2f} ms ({sps:.2f} steps/s)", flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
