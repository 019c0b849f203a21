#!/usr/bin/env python
"""Root entry point matching the reference's inspect_model.py."""
from audio_to_midi_tpu.cli.inspect_model import main

if __name__ == "__main__":
    raise SystemExit(main())
