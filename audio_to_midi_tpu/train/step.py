"""The jitted training step: explicit-DP, gradient accumulation, mixed
precision with dynamic loss scaling, optional ensemble axis.

Reference semantics (train.py:259-332): vmap over the ensemble axis; inside,
a ``lax.scan`` over minibatches under ``jax.checkpoint`` (remat) accumulates
f32 gradients from a scaled f16 backward pass; grads are unscaled by
``grad_scale * minibatch_steps``, checked for finiteness, and applied with the
layerwise-AdamW chain.  The loss returned is the unscaled mean.

TPU-native differences:
  * the batch arrives pre-reshaped (num_minibatches, minibatch, ...) and is
    sharded over the mesh "data" axis via jit in_shardings — the gradient
    all-reduce over ICI is GSPMD-inserted where replicated params meet sharded
    batch grads, same as the reference but on an explicit named mesh;
  * compute dtype defaults to bfloat16 (grad_scale can stay 1.0; the f16
    policy + dynamic scaling is fully supported for parity);
  * each ensemble member gets its own dropout key (the reference broadcast a
    single key across the population — train.py:262 TODO).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.rope import RopeFreqs
from ..parallel.mesh import DATA_AXIS, ENSEMBLE_AXIS
from .loss import batch_loss


class TrainStepOutput(NamedTuple):
    loss: jax.Array          # (E,) unscaled mean loss per ensemble member
    params: Any              # updated params (E-leading axes)
    opt_state: Any
    grads_valid: jax.Array   # (E,) bool — all grads finite
    scaled_loss: jax.Array   # (E,) scaled loss (drives loss-scale doubling)


def make_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    rope: RopeFreqs,
    mesh: Mesh | None = None,
    ensemble: bool = True,
):
    """Build the jitted train step.

    Returned signature:
      step(params, opt_state, audio, labels, key, grad_scale) -> TrainStepOutput
    with audio (num_minibatches, minibatch, 2, N), labels
    (num_minibatches, minibatch, F, K), params/opt_state carrying a leading
    ensemble axis when ``ensemble``.
    """
    compute_dtype = cfg.precision.compute_dtype
    model_cfg = cfg.model

    def member_step(params, opt_state, audio_mb, labels_mb, key, grad_scale):
        @partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
        def scan_body(carry, minibatch):
            acc_grads, key = carry
            audio, labels = minibatch
            key, subkey = jax.random.split(key)
            scaled_loss, grads = jax.value_and_grad(batch_loss)(
                params,
                model_cfg,
                audio,
                labels,
                rope,
                grad_scale,
                subkey,
                compute_dtype,
            )
            acc_grads = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), acc_grads, grads
            )
            return (acc_grads, key), scaled_loss

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
        )
        (acc_grads, _), scaled_losses = jax.lax.scan(
            scan_body, (zero_grads, key), (audio_mb, labels_mb)
        )
        num_minibatches = audio_mb.shape[0]
        scaled_loss = jnp.mean(scaled_losses)

        grads = jax.tree.map(
            lambda g: g / (grad_scale.astype(jnp.float32) * num_minibatches),
            acc_grads,
        )
        grads_valid = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # Always-on non-finite guard (reference train.py:369-377 checks every
        # step regardless of precision): a member whose grads or loss went
        # non-finite keeps its params AND opt state — the bad update is never
        # applied, under bf16 as well as f16.  The f16 host loop additionally
        # rolls back to a snapshot and halves the grad scale.
        valid = grads_valid & jnp.isfinite(scaled_loss)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(valid, n, o), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(valid, n, o), new_opt_state, opt_state
        )
        loss = scaled_loss / grad_scale.astype(jnp.float32)
        return TrainStepOutput(loss, new_params, new_opt_state, valid, scaled_loss)

    def step(params, opt_state, audio, labels, key, grad_scale):
        if ensemble:
            e = jax.tree.leaves(params)[0].shape[0]
            keys = jax.random.split(key, e)
            return jax.vmap(
                member_step, in_axes=(0, 0, None, None, 0, None)
            )(params, opt_state, audio, labels, keys, grad_scale)
        return member_step(params, opt_state, audio, labels, key, grad_scale)

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        kwargs = dict(
            in_shardings=(None, None, batch_sharding, batch_sharding, None, None),
            donate_argnums=(0, 1),
        )
    else:
        kwargs = dict(donate_argnums=(0, 1))
    return jax.jit(step, **kwargs)


def reshape_to_minibatches(batch: jax.Array, minibatch_size: int) -> jax.Array:
    """(B, ...) -> (B // m, m, ...) — reference einops '(b m) ... -> b m ...'."""
    b = batch.shape[0]
    assert b % minibatch_size == 0, (b, minibatch_size)
    return batch.reshape(b // minibatch_size, minibatch_size, *batch.shape[1:])
