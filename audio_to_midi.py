#!/usr/bin/env python
"""Root entry point matching the reference's audio_to_midi.py CLI surface."""
from audio_to_midi_tpu.cli.audio_to_midi import main

if __name__ == "__main__":
    raise SystemExit(main())
