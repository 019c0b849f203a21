"""Malformed-input robustness of the audio decoders.

The CLI feeds arbitrary user files into the hand-rolled native (C++) and
numpy WAV/AIFF parsers (reference surface: python.rs:160-232 via symphonia,
which is fuzz-hardened upstream — our parsers must be equally crash-proof).
Every crafted or mutated input must either decode or raise a clean Python
error; never crash the process or return garbage shapes.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from audio_to_midi_tpu import native
from audio_to_midi_tpu.data import audio_io, labels


def _valid_wav_bytes(n=400, rate=16000, channels=2, bits=16):
    x = (np.sin(np.linspace(0, 40, n * channels)) * 20000).astype("<i2")
    payload = x.tobytes()
    hdr = io.BytesIO()
    block = channels * bits // 8
    hdr.write(b"RIFF")
    hdr.write(struct.pack("<I", 36 + len(payload)))
    hdr.write(b"WAVE")
    hdr.write(b"fmt ")
    hdr.write(struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits))
    hdr.write(b"data")
    hdr.write(struct.pack("<I", len(payload)))
    hdr.write(payload)
    return bytearray(hdr.getvalue())


def _decode_both(path) -> None:
    """Run the file through the native decoder (if built) and the numpy
    fallback; each must either succeed with a (2, N) float array or raise a
    clean, catchable error."""
    if native.available():
        try:
            out = native.decode_audio(path, 16000)
            assert out.ndim == 2 and out.shape[0] == 2
            assert np.isfinite(out).all() or out.size == 0
        except (RuntimeError, ValueError, OSError):
            pass
    try:
        # Full numpy path: parse + rate guard + polyphase resample.
        audio = audio_io.decode_audio(path, 16000)
        assert audio.ndim == 2 and audio.shape[0] == 2
    except (RuntimeError, ValueError, OSError, struct.error, EOFError,
            IndexError, KeyError):
        pass


def test_valid_wav_decodes(tmp_path):
    p = tmp_path / "ok.wav"
    p.write_bytes(bytes(_valid_wav_bytes()))
    if native.available():
        out = native.decode_audio(p, 16000)
        assert out.shape[0] == 2 and out.shape[1] > 0


@pytest.mark.parametrize("cut", [0, 1, 4, 11, 12, 20, 35, 43, 44, 45, 100])
def test_truncated_wav(tmp_path, cut):
    data = _valid_wav_bytes()
    p = tmp_path / "trunc.wav"
    p.write_bytes(bytes(data[:cut]))
    _decode_both(p)


@pytest.mark.parametrize(
    "offset,value",
    [
        (4, 0xFFFFFFFF),   # RIFF size absurd
        (16, 0xFFFFFFFF),  # fmt chunk size absurd
        (22, 0),           # zero channels
        (22, 0xFFFF),      # 65535 channels
        (24, 0),           # zero sample rate
        (34, 0),           # zero bits per sample
        (34, 1024),        # absurd bits per sample
        (40, 0xFFFFFFFF),  # data size way past EOF
    ],
)
def test_corrupt_wav_fields(tmp_path, offset, value):
    data = _valid_wav_bytes()
    width = 2 if offset in (22, 34) else 4
    data[offset : offset + width] = value.to_bytes(width, "little")
    p = tmp_path / "bad.wav"
    p.write_bytes(bytes(data))
    _decode_both(p)


def test_random_mutations(tmp_path):
    """Seeded byte-level fuzz: single/multi-byte corruption anywhere in the
    file must never crash either decoder."""
    rng = np.random.default_rng(42)
    base = _valid_wav_bytes()
    for i in range(200):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(data)))
            data[pos] = int(rng.integers(0, 256))
        p = tmp_path / f"fuzz_{i}.wav"
        p.write_bytes(bytes(data))
        _decode_both(p)


def test_random_garbage_files(tmp_path):
    rng = np.random.default_rng(7)
    for i, n in enumerate([0, 1, 3, 8, 44, 100, 4096]):
        p = tmp_path / f"garbage_{i}.wav"
        p.write_bytes(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        _decode_both(p)
        a = tmp_path / f"garbage_{i}.aif"
        a.write_bytes(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        _decode_both(a)


def test_truncated_aiff(tmp_path):
    """AIFF with a COMM chunk shorter than the 18 required bytes, and a
    truncated extended-80 sample rate."""
    buf = io.BytesIO()
    buf.write(b"FORM")
    buf.write(struct.pack(">I", 30))
    buf.write(b"AIFF")
    buf.write(b"COMM")
    buf.write(struct.pack(">I", 18))
    buf.write(struct.pack(">hIh", 2, 100, 16))  # channels, frames, bits
    buf.write(b"\x40\x0c\xfa")  # extended-80 rate cut short
    p = tmp_path / "cut.aif"
    p.write_bytes(buf.getvalue())
    _decode_both(p)


def _parse_both(path) -> None:
    """CSV label parsing through the native and numpy parsers: both must
    return a (possibly empty) event list on any input, never crash."""
    if native.available():
        try:
            ev = native.parse_events_csv(path, 0.02)
            assert all(len(row) == 4 for row in ev)
        except (RuntimeError, ValueError, OSError):
            pass
    ev = labels.parse_events_csv(path, 0.02)
    assert isinstance(ev, list)


def test_malformed_csv(tmp_path):
    cases = [
        "",
        "\n\n\n",
        "% only a comment\n",
        "a,b,c,d\n",
        "header\n1.0,0.5,60,0.7\n",
        "header\n1e309,0.5,60,0.7\n",        # inf time
        "header\n1.0,inf,60,0.7\n",          # inf duration
        "header\n1.0,0.5,nan,0.7\n",         # nan key
        "header\n1.0,0.5,1e300,0.7\n",       # absurd key
        "header\n-1e308,-1e308,-1e308,-1e308\n",
        "header\n1.0,0.5,60\n",              # too few fields
        "header\n1.0,0.5,60,0.7,extra,fields\n",
        "header\n" + ",".join(["9" * 400] * 4) + "\n",   # huge tokens
        "header\n" + "1.0,0.5,60,0.7\n" * 5000,          # many rows
        "header\n\x00\x01\x02,\xff,60,0.7\n",            # binary garbage
    ]
    for i, text in enumerate(cases):
        p = tmp_path / f"case_{i}.csv"
        p.write_bytes(text.encode("utf-8", "surrogateescape"))
        _parse_both(p)


def test_fuzzed_csv_rasterizes(tmp_path):
    """Events parsed from hostile CSVs (saturated/absurd values) must
    rasterize without out-of-bounds writes."""
    from audio_to_midi_tpu.ops.rasterize import rasterize_events_np

    p = tmp_path / "hostile.csv"
    p.write_text(
        "header\n"
        "1e308,1e308,1e300,1e308\n"
        "-1e308,-1e308,-1e300,-1e308\n"
        "1.0,1e15,60,0.7\n"
        "1e15,0.5,60,0.7\n"
        "1.0,0.5,5,0.7\n"       # key below the vocab (negative after -21)
        "1.0,0.5,200,0.7\n"     # key above the vocab
    )
    ev = labels.parse_events_csv(p, 0.02)  # saturated i32 rows (f32 parse)
    out = rasterize_events_np(ev, num_frames=250, num_keys=90)
    assert out.shape == (250, 90) and np.isfinite(out).all()
    if native.available():
        nev = native.parse_events_csv(p, 0.02)
        assert [tuple(r) for r in nev] == ev  # twins bit-identical
        out = native.rasterize_events(nev, num_frames=250, num_keys=90)
        assert out.shape == (250, 90) and np.isfinite(out).all()


def test_csv_parser_twins_agree_on_hostile_rows(tmp_path):
    """Reference-semantics edge rows must parse IDENTICALLY through the
    numpy and native parsers (python.rs:39-55 deserialize rules: f32 fields
    saturate on overflow and keep the row; u32 key / field-count / trailing
    garbage errors skip the row)."""
    rows = [
        "1.0,inf,60,0.7",          # inf duration: kept, duration saturates
        "1e309,0.5,60,0.7",        # f64-overflow time: f32 inf, kept
        "1e40,0.5,60,0.7",         # f32-overflow time: inf, kept
        "-2.0,0.5,60,0.7",         # negative time: attack 0 (as u32)
        "1.0,0.5,nan,0.7",         # nan key: u32 parse error, row skipped
        "1.0,0.5,60.5,0.7",        # non-integer key: row skipped
        "1.0,0.5,-5,0.7",          # negative key: u32 error, row skipped
        "1.0,0.5,+60,0.7",         # '+' prefix key: accepted by u32 parse
        "1.0,0.5,99999999999,0.7", # key > u32::MAX: row skipped
        "nan,0.5,60,0.7",          # nan time: attack 0
        "1.0,0.5,60,-0.3",         # negative velocity: 0 (as u32)
        "60abc,0.5,60,0.7",        # trailing garbage: row skipped
        "0x1p3,0.5,60,0.7",        # hex float: rejected (Rust rejects)
        "1_0,0.5,60,0.7",          # underscore: rejected (Rust rejects)
        "1.0,0.5,60,0.7,extra",    # 5 fields: UnequalLengths, row skipped
        "1.0,0.5,60",              # 3 fields: UnequalLengths, row skipped
        " 1.23 , 0.5 ,60, 0.7 ",   # Trim::All per-field whitespace
        ".5,0.5,60,0.7",           # leading-dot float accepted
        "1e-50,0.5,60,0.7",        # f32 underflow -> 0.0, kept
        "infinity,0.5,60,0.7",     # long-form inf accepted
    ]
    p = tmp_path / "edges.csv"
    p.write_text("header\n" + "\n".join(rows) + "\n")
    py = labels.parse_events_csv(p, 0.02)
    # Kept rows: every f32-parseable row with a valid u32 key and 4 fields.
    assert len(py) == 11
    assert (0, 39, 25, 7) in py         # negative time saturates to frame 0
    assert (2147483647, 39, 25, 7) in py  # inf time saturates
    if native.available():
        nat = native.parse_events_csv(p, 0.02)
        assert [tuple(r) for r in nat] == py


def test_csv_parser_f32_quantization_boundary(tmp_path):
    """The arithmetic runs in f32 like the reference (frame_position takes
    f32, python.rs:53): a time whose f32 quotient rounds differently from
    the f64 quotient must follow the f32 result through both parsers."""
    # 308.329997 / 0.02: f32 quotient is exactly 15416.5 -> 15417 (half-away);
    # the f64 quotient is 15416.49985 -> 15416.  A f64 port would be off by a
    # frame on this row.
    q32 = int(np.floor(float(np.float32(308.329997) / np.float32(0.02)) + 0.5))
    q64 = int(np.floor(308.329997 / 0.02 + 0.5))
    assert (q32, q64) == (15417, 15416)  # the boundary actually bites
    p = tmp_path / "boundary.csv"
    p.write_text("header\n308.329997,0.5,60,0.7\n")
    py = labels.parse_events_csv(p, 0.02)
    assert py == [(15417, 39, 25, 7)]
    if native.available():
        assert [tuple(r) for r in native.parse_events_csv(p, 0.02)] == py


def test_midi_truncation_is_clean_valueerror(tmp_path):
    """Directed truncation edges: a final delta-time byte with the
    continuation bit set, an event cut at the declared track end, and a
    track length that matches EOF but whose last event is short must all be
    ValueError — never IndexError — and a varint crossing the declared track
    end must not silently consume the next track's bytes."""
    from audio_to_midi_tpu.ops.midi_io import read_midi_file, write_midi_file

    good = tmp_path / "good.mid"
    write_midi_file([(0, 40, 10, 80)], 0.02, good)
    base = bytearray(good.read_bytes())
    assert read_midi_file(good)

    # (a) last byte of the track gets the continuation bit: the varint reader
    # used to walk past the end and IndexError at EOF.
    data = bytearray(base)
    data[-1] |= 0x80
    p = tmp_path / "cont.mid"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        read_midi_file(p)

    # (b) note-on cut one byte short, track length adjusted to match EOF so
    # the header-level length check passes.
    data = bytearray(base)
    data = data[:-1]
    tlen = struct.unpack(">I", bytes(data[18:22]))[0] - 1
    data[18:22] = struct.pack(">I", tlen)
    p2 = tmp_path / "short.mid"
    p2.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        read_midi_file(p2)

    # (c) meta length claims more bytes than the track holds.
    data = bytearray(base)
    data[-1] = 0x40  # end-of-track meta length 0 -> 64
    p3 = tmp_path / "meta.mid"
    p3.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        read_midi_file(p3)


def test_malformed_midi(tmp_path):
    """The SMF reader must raise clean ValueError on corrupted files
    (truncations, mutated bytes, garbage) — never hang, IndexError or
    TypeError."""
    from audio_to_midi_tpu.ops.midi_io import read_midi_file, write_midi_file

    good = tmp_path / "good.mid"
    write_midi_file([(0, 40, 10, 80), (5, 50, 20, 90)], 0.02, good)
    base = bytearray(good.read_bytes())
    assert read_midi_file(good)  # sanity

    rng = np.random.default_rng(3)
    for i in range(150):
        data = bytearray(base)
        mode = i % 3
        if mode == 0:
            data = data[: int(rng.integers(0, len(data)))]
        elif mode == 1:
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        else:
            data = bytearray(rng.integers(0, 256, int(rng.integers(0, 200)),
                                          dtype=np.uint8).tobytes())
        p = tmp_path / f"fuzz_{i}.mid"
        p.write_bytes(bytes(data))
        try:
            out = read_midi_file(p)
            assert isinstance(out, list)
        except (ValueError, struct.error):
            # struct.error only from the fixed-size header unpacks;
            # IndexError must never escape the event loop.
            pass


def test_midi_reader_handles_foreign_channel_messages(tmp_path):
    """Files from other software carry program changes, CCs, pitch bends and
    sysex between notes (and rely on meta/sysex cancelling running status);
    the reader must skip them with correct operand counts, not raise."""
    from audio_to_midi_tpu.ops.midi_io import read_midi_file

    track = bytearray()
    track += bytes([0x00, 0xC0, 0x05])                 # program change
    track += bytes([0x00, 0xB0, 0x07, 0x64])           # CC volume
    track += bytes([0x00, 0x90, 0x3C, 0x50])           # note on C4
    track += bytes([0x10, 0x3E, 0x40])                 # running status note on D4
    track += bytes([0x00, 0xFF, 0x01, 0x03]) + b"abc"  # text meta (cancels RS)
    track += bytes([0x00, 0x90, 0x40, 0x30])           # explicit status required
    track += bytes([0x08, 0xE0, 0x00, 0x40])           # pitch bend
    track += bytes([0x00, 0xF0, 0x02, 0x01, 0xF7])     # sysex, length 2
    track += bytes([0x10, 0x80, 0x3C, 0x00])           # note off
    track += bytes([0x00, 0xFF, 0x2F, 0x00])           # end of track

    data = struct.pack(">4sIHHH", b"MThd", 6, 1, 1, 480)
    data += struct.pack(">4sI", b"MTrk", len(track)) + bytes(track)
    p = tmp_path / "foreign.mid"
    p.write_bytes(data)

    events = read_midi_file(p)
    notes = [e for e in events if e[1].startswith("note")]
    assert notes == [
        (0, "note_on", 0x3C, 0x50),
        (16, "note_on", 0x3E, 0x40),
        (16, "note_on", 0x40, 0x30),
        (40, "note_off", 0x3C, 0x00),
    ]
    assert any(e[1] == "meta_01" for e in events)
