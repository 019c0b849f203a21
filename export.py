#!/usr/bin/env python
"""Root entry point matching the reference's export.py."""
from audio_to_midi_tpu.export import main

if __name__ == "__main__":
    raise SystemExit(main())
