#!/usr/bin/env python
"""Root entry point matching the reference's copy_weights.py."""
from audio_to_midi_tpu.cli.copy_weights import main

if __name__ == "__main__":
    raise SystemExit(main())
