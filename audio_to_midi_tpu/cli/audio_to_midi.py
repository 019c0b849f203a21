"""Primary CLI: audio file -> MIDI, or validation over a labelled directory.

Restores the reference ``audio_to_midi.py`` surface (its --validation path
calls train.py functions with stale signatures and is broken as-is —
SURVEY.md appendix; fixed here).

Usage:
  python -m audio_to_midi_tpu.cli.audio_to_midi <path> [output.mid]
      [--visualize-audio] [--validation] [--individual]
      [--checkpoint DIR]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="audio_to_midi: convert piano audio files to midi events."
    )
    parser.add_argument("path", help="Audio file, or directory for validation")
    parser.add_argument("output", help="The output MIDI file", nargs="?")
    parser.add_argument(
        "--visualize-audio", action="store_true",
        help="Visualize audio samples and event probabilities",
    )
    parser.add_argument(
        "--validation", action="store_true",
        help="Evaluate the model on the provided validation set",
    )
    parser.add_argument(
        "--individual", action="store_true",
        help="Report per-sample losses in the validation set",
    )
    parser.add_argument(
        "--checkpoint", default=None,
        help="Checkpoint directory (default: ./audio_to_midi_checkpoints)",
    )
    parser.add_argument(
        "--overlap", type=float, default=None,
        help="Seconds of window overlap (default: config infer.window_overlap,"
        " 0.5 like the reference audio_to_midi.py:38)",
    )
    parser.add_argument("--config", default=None, help="Config JSON file")
    parser.add_argument(
        "--stream", action="store_true",
        help="Chunked (streaming) transcription: ship/infer/stitch in window "
        "chunks — bounded device memory for hour-long audio, transfer "
        "overlapped with compute, same MIDI as batch mode",
    )
    return parser


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    import jax

    from ..config import load_config
    from ..infer import load_newest_checkpoint, predict_and_stitch, transcribe_file
    from ..models import model as model_lib
    from ..ops.midi_io import write_midi_file

    cfg = load_config(args.config)
    overlap = args.overlap if args.overlap is not None else cfg.infer.window_overlap
    checkpoint_path = Path(
        args.checkpoint or Path.cwd() / cfg.infer.checkpoint_dir
    )
    params, state = load_newest_checkpoint(checkpoint_path, cfg)

    if args.validation:
        from ..train.evaluate import (
            compute_testset_loss,
            compute_testset_loss_individual,
        )

        rope = model_lib.make_rope(cfg.model)
        num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
        if args.individual:
            loss_map = compute_testset_loss_individual(
                params, cfg, Path(args.path), num_frames, rope, ensemble=False,
                generate_visualizations=False,
            )
            for sample_name, losses in loss_map.items():
                print(
                    f"{sample_name}\t{losses['loss']}\t{losses['hit_rate']}\t"
                    f"{losses['eventized_diff']}\t{losses['phantom_note_diff']}\t"
                    f"{losses['missed_note_diff']}"
                )
        else:
            loss, hit_rate, eventized_diff, _ = compute_testset_loss(
                params, cfg, Path(args.path), num_frames, rope, ensemble=False,
                generate_visualizations=False,
            )
            print(f"Validation loss: {float(loss[0])}")
            print(f"Hit rate: {float(hit_rate[0])}")
            print(f"Eventized diff: {float(eventized_diff[0])}")
        return 0

    audio_file = Path(args.path)
    if not audio_file.exists():
        raise FileNotFoundError(f"The specified audio file {audio_file} does not exist!")

    if args.visualize_audio:
        from ..data.loader import load_and_slice_full_audio
        from ..utils.visualize import plot_output_probs, visualize_sample
        import matplotlib.pyplot as plt

        windows, window_duration = load_and_slice_full_audio(
            audio_file,
            overlap=overlap,
            sample_rate=cfg.data.sample_rate,
            window_duration=cfg.data.model_audio_length,
        )
        individual_probs, stitched, dpf = predict_and_stitch(
            params, cfg, windows, window_duration, overlap=overlap
        )
        for i in range(individual_probs.shape[0]):
            visualize_sample(str(audio_file), windows[i], individual_probs[i])
        plot_output_probs(str(audio_file), dpf, stitched)
        from ..ops.eventize import extract_events

        events = extract_events(stitched)
        duration_per_frame = dpf
    else:
        if args.stream:
            from ..infer import transcribe_file_streaming

            stitched, duration_per_frame, events = transcribe_file_streaming(
                params, cfg, audio_file, overlap=overlap
            )
        else:
            # Multi-chip serving host: shard the window batches over all
            # chips (params replicated); identical output to single-chip.
            mesh = None
            if len(jax.devices()) > 1:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh(1)
            stitched, duration_per_frame, events = transcribe_file(
                params, cfg, audio_file, overlap=overlap, mesh=mesh
            )

    print(f"Stitched probs shape: {stitched.shape}")
    print(f"Extracted {len(events)} events")
    if args.output:
        print(f"Writing MIDI file to {args.output}")
        write_midi_file(events, duration_per_frame, args.output)
    if args.visualize_audio:
        # Block AFTER all work is done so the figures stay on screen (a
        # non-blocking show followed by process exit displays nothing).
        import matplotlib.pyplot as plt

        plt.show(block=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
