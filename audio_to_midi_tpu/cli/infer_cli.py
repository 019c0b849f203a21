"""Secondary inference CLI (reference infer.py:303-362 surface).

Usage:
  python -m audio_to_midi_tpu.cli.infer_cli <input_file> [--midi OUT]
      [--validation] [--checkpoint DIR] [--plot]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Process audio file to generate MIDI data."
    )
    parser.add_argument("input_file", help="Path to the input audio file.")
    parser.add_argument("--midi", help="Path to the output MIDI file.", default=None)
    parser.add_argument(
        "--validation", action="store_true",
        help="Expect a directory and calculate the validation loss",
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--overlap", type=float, default=None,
        help="Seconds of window overlap (default: infer.window_overlap from"
        " --config if given, else 0.25 like the reference infer.py:339)",
    )
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--config", default=None, help="Config JSON file")
    args = parser.parse_args(argv)

    from ..config import load_config
    from ..infer import load_newest_checkpoint, transcribe_file
    from ..models import model as model_lib
    from ..ops.midi_io import write_midi_file

    cfg = load_config(args.config)
    if args.overlap is not None:
        overlap = args.overlap
    elif args.config is not None:
        overlap = cfg.infer.window_overlap
    else:
        overlap = 0.25
    checkpoint_path = Path(args.checkpoint or Path.cwd() / cfg.infer.checkpoint_dir)
    params, _state = load_newest_checkpoint(checkpoint_path, cfg)

    if args.validation:
        from ..train.evaluate import compute_testset_loss_individual

        rope = model_lib.make_rope(cfg.model)
        num_frames = cfg.model.output_frames(cfg.data.samples_per_window)
        loss_map = compute_testset_loss_individual(
            params, cfg, Path(args.input_file), num_frames, rope, ensemble=False,
            generate_visualizations=False,
        )
        losses = np.stack([v["loss"] for v in loss_map.values()])
        print("Average loss: ", float(np.mean(losses)))
        return 0

    stitched, dpf, events = transcribe_file(
        params, cfg, args.input_file, overlap=overlap
    )
    print(f"Frame count: {stitched.shape[0]}")
    print(f"Events: {events}")
    if args.midi:
        write_midi_file(events, dpf, args.midi)
        print(f"Wrote {args.midi}")
    if args.plot:
        import matplotlib.pyplot as plt

        from ..utils.visualize import plot_output_probs

        plot_output_probs("Inferred probs", dpf, stitched)
        plt.show(block=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
