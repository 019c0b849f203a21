#!/usr/bin/env python
"""Root entry point matching the reference's infer.py CLI surface."""
from audio_to_midi_tpu.cli.infer_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
