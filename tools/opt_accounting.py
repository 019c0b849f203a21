"""Per-stage breakdown of the optimizer section (VERDICT r04 #3).

TRAINACCT_r04 measured the whole optimizer chain as one 6.9 ms black box —
~14% of the 47.75 ms step and ~20x its ~0.3 ms HBM floor (11.6 M params x
~12 full-tree passes ~= 0.5 GB at ~1.6 TB/s v5e HBM).  This tool measures
each stage of the section the step runs after the accumulation scan
(train/step.py:96-118):

  finite   — all-leaves isfinite reduction over the grads
  adamw    — optax.adamw update alone
  scale    — the per-leaf layerwise-LR factor multiply
  clip     — optax.clip_by_global_norm alone
  chain    — the full tx.update (adamw + scale + clip)
  apply    — optax.apply_updates alone (prebuilt updates)
  guards   — the two validity where-selects (params + opt state)
  full     — everything the step does after grads, composed exactly

Methodology: each program runs a lax.scan of --iters iterations INSIDE one
jitted program (carry threads params/opt state, so iterations serialize like
real steps), device-profiled (tools/profiler_bench._program_ms) — no
dispatch noise at all.  Ensemble vmap (E=1) matches the step's shape.
Writes OPTACCT.json.

Usage: python tools/opt_accounting.py [--iters 20]
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="OPTACCT.json")
    args = p.parse_args()

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax
    import jax.numpy as jnp
    import optax
    from profiler_bench import _program_ms

    from audio_to_midi_tpu.config import Config
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.train import setup_optimizers
    from audio_to_midi_tpu.train.optim import (
        create_learning_rate_schedule,
        lr_decay_factors,
        _scale_updates_per_leaf,
    )

    cfg = Config()
    params, _ = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    grads = jax.tree.map(lambda x: (x * 1e-4).astype(jnp.float32), params)
    member_params = jax.tree.map(lambda x: x[0], params)
    factors = lr_decay_factors(member_params, cfg.model, cfg.train.layer_lr_decay)

    adamw_only = optax.adamw(
        create_learning_rate_schedule(
            cfg.train.base_learning_rate, cfg.train.warmup_steps,
            cfg.train.num_steps,
        ),
        b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
        eps=cfg.train.adam_eps, weight_decay=cfg.train.weight_decay,
    )
    adamw_state = jax.vmap(adamw_only.init)(params)
    clip_only = optax.clip_by_global_norm(cfg.train.global_norm_clip)
    scale_only = _scale_updates_per_leaf(factors)

    results = {}

    def measure(tag, program, *operands):
        program.__name__ = f"optacct_{tag}"
        fn = jax.jit(program)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*operands))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*operands))
        td = tempfile.mkdtemp(prefix="optacct_")
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*operands))
            dev_ms = _program_ms(td, f"jit_optacct_{tag}")
        finally:
            shutil.rmtree(td, ignore_errors=True)
        per_iter = dev_ms / args.iters
        results[tag] = round(per_iter, 3)
        print(f"{tag}: {per_iter:.3f} ms/iter (compile {compile_s:.0f}s)",
              flush=True)

    def scan_over(body, carry, extras=()):
        """Build a program scanning `body` iters times with grads perturbed
        per iteration (i-dependent) so nothing folds to a constant."""

        def program(carry, grads, *extras):
            def step(c, i):
                g = jax.tree.map(lambda x: x + (i.astype(jnp.float32) * 1e-9), grads)
                return body(c, g, *extras), None

            out, _ = jax.lax.scan(step, carry, jnp.arange(args.iters))
            return out

        return program, (carry, grads) + tuple(extras)

    # 1. finite check
    def finite_body(acc, g):
        ok = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g)])
        )
        return acc & ok

    prog, ops = scan_over(finite_body, jnp.bool_(True))
    measure("finite", prog, *ops)

    # 2. adamw alone (vmapped member, carry = (params, opt))
    def adamw_body(carry, g):
        p, o = carry

        def member(p, o, g):
            u, o2 = adamw_only.update(g, o, p)
            return optax.apply_updates(p, u), o2

        p2, o2 = jax.vmap(member)(p, o, g)
        return (p2, o2)

    prog, ops = scan_over(adamw_body, (params, adamw_state))
    measure("adamw_apply", prog, *ops)

    # 3. scale stage alone
    def scale_body(carry, g):
        def member(g):
            u, _ = scale_only.update(g, optax.EmptyState(), None)
            return u

        return jax.vmap(member)(g)

    prog, ops = scan_over(lambda c, g: scale_body(c, g), grads)
    measure("scale", prog, *ops)

    # 4. clip alone
    def clip_body(carry, g):
        def member(g):
            u, _ = clip_only.update(g, optax.EmptyState(), None)
            return u

        return jax.vmap(member)(g)

    prog, ops = scan_over(clip_body, grads)
    measure("clip", prog, *ops)

    # 5. full chain + apply (what TRAINACCT called opt_chain)
    def chain_body(carry, g):
        p, o = carry

        def member(p, o, g):
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2

        return jax.vmap(member)(p, o, g)

    prog, ops = scan_over(chain_body, (params, opt_state))
    measure("chain_apply", prog, *ops)

    # 6. validity guards alone (the step's two where-select tree passes)
    def guards_body(carry, g):
        p, o = carry
        valid = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g)])
        )
        p2 = jax.tree.map(lambda n, old: jnp.where(valid, n, old), p, p)
        o2 = jax.tree.map(lambda n, old: jnp.where(valid, n, old), o, o)
        return (p2, o2)

    prog, ops = scan_over(guards_body, (params, opt_state))
    measure("finite_plus_guards", prog, *ops)

    # 7. the full post-grad section exactly as step.py composes it
    def full_body(carry, g):
        p, o = carry

        def member(p, o, g):
            gv = jnp.all(
                jnp.array([jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g)])
            )
            u, o2 = tx.update(g, o, p)
            p2 = optax.apply_updates(p, u)
            valid = gv
            p2 = jax.tree.map(lambda n, old: jnp.where(valid, n, old), p2, p)
            o2 = jax.tree.map(lambda n, old: jnp.where(valid, n, old), o2, o)
            return p2, o2

        return jax.vmap(member)(p, o, g)

    prog, ops = scan_over(full_body, (params, opt_state))
    measure("full_section", prog, *ops)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
