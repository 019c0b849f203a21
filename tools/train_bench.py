"""Training-throughput benchmark at the reference's production shape
(train.py:743-772: batch 64, full default model; minibatch from TrainConfig).

Measures:
  * device-resident: synthetic batches pre-placed on device — pure train-step
    cost (compile excluded), steps/s and train audio-sec/s;
  * loader path: the same steps fed by the real ThreadedBatchLoader over a
    synthetic WAV+CSV dataset (host decode/augment/batch included).

Writes TRAINBENCH.json and prints one JSON line per mode.

Usage: python tools/train_bench.py [--steps 30] [--batch 64] [--minibatch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--minibatch", type=int, default=None,
               help="per-device accumulation minibatch (default: TrainConfig default)")
    p.add_argument("--out", default="TRAINBENCH.json")
    p.add_argument("--skip-loader", action="store_true")
    p.add_argument("--dropout-rate", type=float, default=None,
                   help="override transformer_dropout_rate (default: config 0.1)")
    p.add_argument(
        "--modes", default="device,ring,wire,host,devaug",
        help="comma list of modes to run (device,ring,wire,host,devaug)",
    )
    args = p.parse_args()
    modes = set(args.modes.split(","))

    import jax

    from audio_to_midi_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax.numpy as jnp
    import numpy as np

    from audio_to_midi_tpu.config import Config, TrainConfig
    from audio_to_midi_tpu.models import model as model_lib
    from audio_to_midi_tpu.parallel.mesh import make_mesh, shard_params
    from audio_to_midi_tpu.train import (
        make_train_step,
        reshape_to_minibatches,
        setup_optimizers,
    )

    if args.minibatch is None:
        args.minibatch = TrainConfig().minibatch_size_per_device
    cfg = Config(
        train=TrainConfig(
            batch_size=args.batch,
            minibatch_size_per_device=args.minibatch,
            num_steps=200_000,
        )
    )
    if args.dropout_rate is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, transformer_dropout_rate=args.dropout_rate
            ),
        )
    mesh = make_mesh(1)
    rope = model_lib.make_rope(cfg.model)
    num_frames = cfg.model.output_frames(cfg.data.samples_per_window)

    params, state = model_lib.init_ensemble(jax.random.PRNGKey(0), cfg.model, 1)
    params = shard_params(params, mesh)
    tx, _ = setup_optimizers(params, cfg.model, cfg.train, ensemble=True)
    opt_state = jax.vmap(tx.init)(params)
    opt_state = shard_params(opt_state, mesh)
    step_fn = make_train_step(cfg, tx, rope, mesh=mesh, ensemble=True)
    minibatch = min(args.minibatch * max(1, len(jax.devices())), args.batch)

    audio = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, 2, cfg.data.samples_per_window), jnp.float32
    )
    labels = (
        jax.random.uniform(jax.random.PRNGKey(2), (args.batch, num_frames, 90)) > 0.95
    ).astype(jnp.float32)
    audio_mb = reshape_to_minibatches(audio, minibatch)
    labels_mb = reshape_to_minibatches(labels, minibatch)
    scale = jnp.asarray(1.0, cfg.precision.compute_dtype)

    results = {}

    def run_steps(n, feed):
        nonlocal params, opt_state
        key = jax.random.PRNGKey(3)
        prev = None
        for i in range(n):
            a_mb, l_mb = feed(i)
            key, k = jax.random.split(key)
            out = step_fn(params, opt_state, a_mb, l_mb, k, scale)
            if prev is not None:
                jax.block_until_ready(prev)
            prev = out.loss
            params, opt_state = out.params, out.opt_state
        jax.block_until_ready(prev)
        return out

    # -- device-resident ---------------------------------------------------
    t0 = time.perf_counter()
    run_steps(2, lambda i: (audio_mb, labels_mb))  # compile + warm
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    if "device" in modes:
        t0 = time.perf_counter()
        run_steps(args.steps, lambda i: (audio_mb, labels_mb))
        dt = (time.perf_counter() - t0) / args.steps
        sps = 1.0 / dt
        audio_sec_s = sps * args.batch * cfg.data.model_audio_length
        results["device_resident"] = {
            "batch": args.batch, "minibatch": minibatch,
            "steps_per_s": round(sps, 3), "train_audio_sec_per_s": round(audio_sec_s, 1),
            "ms_per_step": round(dt * 1e3, 2),
        }
        print(json.dumps({"mode": "device_resident", **results["device_resident"]}), flush=True)

    # -- real loader path --------------------------------------------------
    if not args.skip_loader:
        from audio_to_midi_tpu.data import loader as loader_lib
        from audio_to_midi_tpu.data.synthetic import make_synthetic_dataset

        import os

        work = Path(tempfile.mkdtemp(prefix="a2m_trainbench_"))
        # Decoded-sample cache (reference SAMPLE_CACHE_DIR, python.rs:301):
        # without it every batch re-decodes + resamples its WAVs on the host.
        os.environ.setdefault("SAMPLE_CACHE_DIR", str(work / "cache"))
        make_synthetic_dataset(
            work, num_samples=24, duration_s=10.0,
            sample_rate=cfg.data.sample_rate, notes_per_sample=8, seed=7,
        )
        from audio_to_midi_tpu.data.augment_device import transform_for_training_device

        device_augment = jax.jit(
            lambda a, e, k: transform_for_training_device(a, e, cfg.transforms, k)
        )

        # -- device input ring (the default training feed) -----------------
        from audio_to_midi_tpu.data.device_ring import DeviceInputRing, _Feeder

        if "ring" in modes:
          ldr = loader_lib.ThreadedBatchLoader(
            work, batch_size=args.batch, num_model_output_frames=num_frames,
            num_workers=cfg.train.dataset_num_workers,
            transform_settings=None,
          )
          with ldr:
            ring = DeviceInputRing(1024, args.batch)
            feeder = _Feeder(iter(ldr))
            skey = jax.random.PRNGKey(11)

            def feed_ring(i):
                nonlocal skey
                ring.pull(feeder, min_fill=args.batch)
                skey, k = jax.random.split(skey)
                return ring.sample(k, args.batch, minibatch, cfg.transforms)

            run_steps(2, feed_ring)  # warm
            t0 = time.perf_counter()
            run_steps(args.steps, feed_ring)
            dt = (time.perf_counter() - t0) / args.steps
          sps = 1.0 / dt
          results["loader_ring"] = {
            "batch": args.batch, "minibatch": minibatch,
            "steps_per_s": round(sps, 3),
            "train_audio_sec_per_s": round(sps * args.batch * cfg.data.model_audio_length, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "ring_capacity": ring.capacity,
            "windows_refreshed": ring.pushed_windows,
            "note": "device-resident ring: sample+augment on device, async host refresh",
          }
          print(json.dumps({"mode": "loader_ring", **results["loader_ring"]}), flush=True)

        # -- raw wire bandwidth over the host->device link ------------------
        if "wire" in modes:
          chunk = np.random.default_rng(0).standard_normal(
            (args.batch, 2, cfg.data.samples_per_window)
          ).astype(np.float16)
          jax.block_until_ready(jax.device_put(chunk))  # warm path
          bws = []
          for i in range(5):
            fresh = chunk + np.float16(i + 1)
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(fresh))
            bws.append(chunk.nbytes / (time.perf_counter() - t0) / 1e6)
          results["wire_bandwidth_MBps"] = {
            "chunk_mb": round(chunk.nbytes / 1e6, 1),
            "runs": [round(b, 1) for b in bws],
            "median": round(sorted(bws)[2], 1),
          }
          print(json.dumps({"mode": "wire", **results["wire_bandwidth_MBps"]}), flush=True)

        host_modes = []
        if "host" in modes:
            host_modes.append(("loader_host_augment", cfg.transforms))
        if "devaug" in modes:
            host_modes.append(("loader_device_augment", None))
        for mode, host_transforms in host_modes:
            ldr = loader_lib.ThreadedBatchLoader(
                work, batch_size=args.batch, num_model_output_frames=num_frames,
                num_workers=cfg.train.dataset_num_workers,
                transform_settings=host_transforms,
            )
            with ldr:
                it = iter(ldr)
                akey = jax.random.PRNGKey(9)

                def feed(i, it=it, aug=host_transforms is None):
                    nonlocal akey
                    events, a = next(it)
                    a = jnp.asarray(a)
                    events = jnp.asarray(events)
                    if aug:
                        akey, k = jax.random.split(akey)
                        a, events = device_augment(
                            a.astype(jnp.float32), events.astype(jnp.float32), k
                        )
                    return (
                        reshape_to_minibatches(a, minibatch),
                        reshape_to_minibatches(events, minibatch),
                    )

                run_steps(2, feed)  # warm (loader + step already compiled)
                t0 = time.perf_counter()
                run_steps(args.steps, feed)
                dt = (time.perf_counter() - t0) / args.steps
            sps = 1.0 / dt
            results[mode] = {
                "batch": args.batch, "minibatch": minibatch,
                "steps_per_s": round(sps, 3),
                "train_audio_sec_per_s": round(sps * args.batch * cfg.data.model_audio_length, 1),
                "ms_per_step": round(dt * 1e3, 2),
                "workers": cfg.train.dataset_num_workers,
            }
            print(json.dumps({"mode": mode, **results[mode]}), flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
