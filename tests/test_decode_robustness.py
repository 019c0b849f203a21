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
    if native.available():
        ev = native.parse_events_csv(p, 0.02)  # saturated int32 rows
        out = native.rasterize_events(ev, num_frames=250, num_keys=90)
        assert out.shape == (250, 90) and np.isfinite(out).all()
    ev = labels.parse_events_csv(p, 0.02)  # unbounded python ints
    out = rasterize_events_np(ev, num_frames=250, num_keys=90)
    assert out.shape == (250, 90) and np.isfinite(out).all()


def test_malformed_midi(tmp_path):
    """The SMF reader must raise clean ValueError/IndexError on corrupted
    files (truncations, mutated bytes, garbage) — never hang or TypeError."""
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
        except (ValueError, IndexError, struct.error):
            pass
