"""Sanity run on real hardware: overfit the full default model on a tiny
synthetic dataset and report loss trajectory + step time + eval metrics.

Usage: python tools/overfit_check.py [--steps 200] [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_to_midi_tpu.config import Config, TrainConfig  # noqa: E402
from audio_to_midi_tpu.data import loader, synthetic  # noqa: E402
from audio_to_midi_tpu.models import model as model_lib  # noqa: E402
from audio_to_midi_tpu.parallel import make_mesh, shard_params, batch_spec  # noqa: E402
from audio_to_midi_tpu.train import (  # noqa: E402
    make_train_step,
    reshape_to_minibatches,
    setup_optimizers,
)
from audio_to_midi_tpu.train.evaluate import compute_testset_loss  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--minibatch", type=int, default=8)
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--lr", type=float, default=4e-4)
    args = p.parse_args()

    cfg = Config(
        train=TrainConfig(
            batch_size=args.batch,
            minibatch_size_per_device=args.minibatch,
            num_steps=args.steps,
            warmup_steps=20,
            base_learning_rate=args.lr,
            testset_loss_every=10_000,
        )
    )

    tmp = Path(tempfile.mkdtemp(prefix="a2m_overfit_"))
    synthetic.make_synthetic_dataset(
        tmp, num_samples=args.samples, duration_s=5.0, notes_per_sample=8, seed=7
    )
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)

    audio_list, events_list, names = loader.load_events_and_audio(
        tmp, loader.load_sample_names(tmp), cfg.data.sample_rate,
        cfg.data.model_audio_length, num_frames,
    )
    audio = np.stack(audio_list)
    labels = np.stack(events_list)
    reps = max(1, args.batch // audio.shape[0] + 1)
    audio = np.tile(audio, (reps, 1, 1))[: args.batch]
    labels = np.tile(labels, (reps, 1, 1))[: args.batch]
    print(f"dataset: {len(names)} windows, batch {audio.shape}", file=sys.stderr)

    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)

    step_fn = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
    audio_mb = jax.device_put(
        reshape_to_minibatches(jnp.asarray(audio), args.minibatch), batch_spec(mesh, 1)
    )
    labels_mb = jax.device_put(
        reshape_to_minibatches(jnp.asarray(labels), args.minibatch), batch_spec(mesh, 1)
    )

    key = jax.random.PRNGKey(1)
    scale = jnp.asarray(1.0, cfg.precision.compute_dtype)
    t_compile = time.time()
    losses = []
    for i in range(args.steps):
        key, k = jax.random.split(key)
        out = step_fn(params, opt_state, audio_mb, labels_mb, k, scale)
        params, opt_state = out.params, out.opt_state
        if i == 0:
            jax.block_until_ready(out.loss)
            print(f"first step (compile): {time.time() - t_compile:.1f}s", file=sys.stderr)
            t0 = time.time()
        losses.append(float(out.loss[0]))
        if i % 20 == 0:
            print(f"step {i}: loss {losses[-1]:.2f} valid={bool(out.grads_valid[0])}", file=sys.stderr)
    jax.block_until_ready(out.loss)
    dt = time.time() - t0
    sps = (args.steps - 1) / dt
    print(
        f"steps/sec: {sps:.2f} ({args.batch * sps:.1f} windows/s, "
        f"{args.batch * sps * 5:.0f} audio-sec/s train throughput)",
        file=sys.stderr,
    )
    print(f"loss: {losses[0]:.1f} -> {losses[-1]:.1f}", file=sys.stderr)

    loss, hit, eventized, _ = compute_testset_loss(
        params, cfg, tmp, num_frames, rope, ensemble=True
    )
    print(f"trainset eval: loss={loss} hit_rate={hit} eventized={eventized}", file=sys.stderr)
    ok = losses[-1] < losses[0] * 0.25
    print(f"overfit check {'PASS' if ok else 'FAIL'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
