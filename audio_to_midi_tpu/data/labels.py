"""CSV MIDI-event label parsing.

Reference semantics (python.rs:39-103): per-sample ``<name>.csv`` with rows
``time,duration,key,velocity`` — no header, ``%`` comment lines, whitespace
trimmed, and (quirk preserved on purpose) the FIRST data record is skipped
(python.rs:72 ``.skip(1)``; the datasets carry a header-ish first row).
Quantization: attack = round(time / dpf), key -> key - 21 (piano A0..C8 ->
0..87), duration -> round(duration / dpf) clamped to >= 1, velocity ->
round(velocity * 10); rounds are half-away-from-zero like Rust's ``.round()``.
"""

from __future__ import annotations

import math
from pathlib import Path

Event = tuple[int, int, int, int]  # (attack_frame, key, duration_frames, velocity)


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def parse_events_csv(path: str | Path, duration_per_frame: float) -> list[Event]:
    events: list[Event] = []
    first_record = True
    for raw_line in Path(path).read_text().splitlines():
        line = raw_line.strip()
        if not line or line.startswith("%"):
            continue
        if first_record:
            first_record = False  # reference skips the first data row
            continue
        parts = [p.strip() for p in line.split(",")]
        if len(parts) < 4:
            continue
        try:
            time, duration, key, velocity = (
                float(parts[0]), float(parts[1]), int(float(parts[2])), float(parts[3]),
            )
            attack = _round_half_away(time / duration_per_frame)
            duration_frames = max(_round_half_away(duration / duration_per_frame), 1)
            vel = _round_half_away(velocity * 10.0)
        except (ValueError, OverflowError):
            # non-numeric tokens, or inf/nan from a malformed file (int() /
            # floor() raise OverflowError on inf) — skip the line
            continue
        events.append((attack, key - 21, duration_frames, vel))
    events.sort()
    return events


def write_events_csv(path: str | Path, events_seconds, header: bool = True) -> None:
    """Write (time_s, duration_s, midi_key, velocity01) rows.

    When ``header`` is True a dummy first row is included so the parser's
    skip-first-record behaviour lines up (as the reference datasets do).
    """
    lines = ["% time,duration,key,velocity"]
    if header:
        lines.append("0.0,0.0,21,0.0")
    for t, d, k, v in events_seconds:
        lines.append(f"{t},{d},{k},{v}")
    Path(path).write_text("\n".join(lines) + "\n")
