#!/usr/bin/env python
"""Root entry point matching the reference's train.py."""
from audio_to_midi_tpu.cli.train_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
