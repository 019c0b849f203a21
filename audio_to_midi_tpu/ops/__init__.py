from . import eventize, frontend, midi_io, rasterize, stitch
from .eventize import extract_events, extract_events_dense
from .frontend import normalize_loudness, resample_poly, slice_full_audio
from .midi_io import write_midi_file
from .rasterize import rasterize_dense, rasterize_events_np, to_frame_events
from .stitch import stitch_probs

__all__ = [
    "eventize",
    "frontend",
    "midi_io",
    "rasterize",
    "stitch",
    "extract_events",
    "extract_events_dense",
    "normalize_loudness",
    "resample_poly",
    "slice_full_audio",
    "write_midi_file",
    "rasterize_dense",
    "rasterize_events_np",
    "to_frame_events",
    "stitch_probs",
]
