"""ctypes bindings for the C++ host data plane (cpp/a2m_native.cpp).

Loads ``liba2m_native.so`` (building it with cmake/g++ on first use when a
toolchain is available) and exposes numpy-facing wrappers with the exact
semantics of the pure-Python implementations in audio_to_midi_tpu.data /
audio_to_midi_tpu.ops — the loaders pick whichever is available, and the test
suite asserts both paths agree.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parent.parent
_CPP_DIR = _REPO_ROOT / "cpp"
_BUILD_DIR = _CPP_DIR / "build"
_LIB = None
_LOAD_FAILED = False


def _lib_path() -> Path:
    return _BUILD_DIR / "liba2m_native.so"


def build(force: bool = False) -> Path:
    """Build the native library (cmake+ninja, falling back to bare g++)."""
    out = _lib_path()
    src = _CPP_DIR / "a2m_native.cpp"
    if out.exists() and not force and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release", ".."],
            cwd=_BUILD_DIR, check=True, capture_output=True,
        )
        subprocess.run(["ninja"], cwd=_BUILD_DIR, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.info("cmake build failed (%s); trying bare g++", e)
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fno-math-errno", "-std=c++17",
                "-shared", "-fPIC", str(src), "-o", str(out),
            ],
            check=True, capture_output=True,
        )
    return out


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    if os.environ.get("A2M_DISABLE_NATIVE"):
        _LOAD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(build()))
    except Exception as e:  # no toolchain / unsupported platform
        log.info("native data plane unavailable: %s", e)
        _LOAD_FAILED = True
        return None

    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
    c_i32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))
    c_u32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32))

    lib.a2m_free.argtypes = [ctypes.c_void_p]
    lib.a2m_decode_audio.argtypes = [ctypes.c_char_p, ctypes.c_int, c_f32pp, c_i64p]
    lib.a2m_normalize_loudness.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.a2m_load_audio_sample.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, c_f32pp, c_i64p,
    ]
    lib.a2m_load_audio_sample_f16.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)), c_i64p,
    ]
    lib.a2m_f16_to_f32_buf.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.a2m_f32_to_f16_buf.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int64,
    ]
    lib.a2m_parse_events_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_double, c_i32pp, c_i64p,
    ]
    lib.a2m_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.a2m_transform_for_training.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_uint64,
    ]
    lib.a2m_stitch_probs.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, c_f32pp, c_i64p,
    ]
    lib.a2m_extract_events.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        c_u32pp, c_i64p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _take_f32(lib, ptr, shape) -> np.ndarray:
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(np.float32).reshape(shape)
    lib.a2m_free(ptr)
    return arr


def decode_audio(path: str | Path, sample_rate: int) -> np.ndarray:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.a2m_decode_audio(str(path).encode(), sample_rate, ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"a2m_decode_audio({path}) failed: {rc}")
    return _take_f32(lib, out, (2, n.value))


def load_audio_sample(
    path: str | Path, sample_rate: int, skip_cache: int | bool = False
) -> np.ndarray:
    """skip_cache bitmask: bit0 = skip cache read, bit1 = skip cache write
    (bool True == legacy skip-read-still-write)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.a2m_load_audio_sample(
        str(path).encode(), sample_rate, int(skip_cache), ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise RuntimeError(f"a2m_load_audio_sample({path}) failed: {rc}")
    return _take_f32(lib, out, (2, n.value))


def load_audio_sample_f16(
    path: str | Path, sample_rate: int, skip_cache: int | bool = False
) -> np.ndarray:
    """(2, N) float16 — decode+normalize left in the reference's f16 decode
    dtype (the serving host->device wire format; cache hits are memcpy).
    skip_cache bitmask as in load_audio_sample."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint16)()
    n = ctypes.c_int64()
    rc = lib.a2m_load_audio_sample_f16(
        str(path).encode(), sample_rate, int(skip_cache), ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise RuntimeError(f"a2m_load_audio_sample_f16({path}) failed: {rc}")
    total = 2 * n.value
    arr = np.ctypeslib.as_array(out, shape=(total,)).view(np.float16).copy()
    lib.a2m_free(out)
    return arr.reshape(2, n.value)


def f16_to_f32_buf(h: np.ndarray) -> np.ndarray:
    lib = _load()
    h = np.ascontiguousarray(h, np.float16)
    out = np.empty(h.shape, np.float32)
    lib.a2m_f16_to_f32_buf(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h.size,
    )
    return out


def f32_to_f16_buf(f: np.ndarray) -> np.ndarray:
    lib = _load()
    f = np.ascontiguousarray(f, np.float32)
    out = np.empty(f.shape, np.uint16)
    lib.a2m_f32_to_f16_buf(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), f.size,
    )
    return out.view(np.float16)


def normalize_loudness(samples: np.ndarray) -> np.ndarray:
    lib = _load()
    buf = np.ascontiguousarray(samples, np.float32).copy()
    lib.a2m_normalize_loudness(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.shape[1]
    )
    return buf


def parse_events_csv(path: str | Path, duration_per_frame: float) -> list[tuple[int, int, int, int]]:
    lib = _load()
    out = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    rc = lib.a2m_parse_events_csv(
        str(path).encode(), duration_per_frame, ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise RuntimeError(f"a2m_parse_events_csv({path}) failed: {rc}")
    if n.value == 0:
        lib.a2m_free(out)
        return []
    arr = np.ctypeslib.as_array(out, shape=(n.value, 4)).copy()
    lib.a2m_free(out)
    return [tuple(int(v) for v in row) for row in arr]


def rasterize_events(
    events, num_frames: int, start_frame: int = 0, backing_frames: int | None = None,
    num_keys: int = 90,
) -> np.ndarray:
    lib = _load()
    if backing_frames is None:
        backing_frames = num_frames
    ev = np.ascontiguousarray(np.asarray(events, np.int32).reshape(-1, 4))
    out = np.zeros((num_frames, num_keys), np.float32)
    lib.a2m_rasterize(
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ev.shape[0],
        num_frames, start_frame, backing_frames, num_keys,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def transform_for_training(
    audio: np.ndarray, labels: np.ndarray, settings, seed: int = 0
) -> None:
    """In-place augmentation of (B, 2, N) audio + (B, F, K) labels."""
    lib = _load()
    assert audio.flags.c_contiguous and labels.flags.c_contiguous
    assert audio.dtype == np.float32 and labels.dtype == np.float32
    s = np.asarray(settings.as_tuple(), np.float64)
    rc = lib.a2m_transform_for_training(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[0], audio.shape[2], labels.shape[1], labels.shape[2],
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(settings.parity_pan_uses_channel_switch_probability),
        seed,
    )
    if rc != 0:
        raise RuntimeError(f"a2m_transform_for_training failed: {rc}")


def stitch_probs(all_probs: np.ndarray, overlap: float, duration_per_frame: float) -> np.ndarray:
    lib = _load()
    probs = np.ascontiguousarray(all_probs, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    rc = lib.a2m_stitch_probs(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        probs.shape[0], probs.shape[1], probs.shape[2],
        overlap, duration_per_frame, ctypes.byref(out), ctypes.byref(frames),
    )
    if rc != 0:
        raise RuntimeError(f"a2m_stitch_probs failed: {rc}")
    return _take_f32(lib, out, (frames.value, probs.shape[2]))


def extract_events(probs: np.ndarray) -> list[tuple[int, int, int, int]]:
    lib = _load()
    p = np.ascontiguousarray(probs, np.float32)
    out = ctypes.POINTER(ctypes.c_uint32)()
    n = ctypes.c_int64()
    rc = lib.a2m_extract_events(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.shape[0], p.shape[1], ctypes.byref(out), ctypes.byref(n),
    )
    if rc != 0:
        raise RuntimeError(f"a2m_extract_events failed: {rc}")
    if n.value == 0:
        lib.a2m_free(out)
        return []
    arr = np.ctypeslib.as_array(out, shape=(n.value, 4)).copy()
    lib.a2m_free(out)
    return [tuple(int(v) for v in row) for row in arr]
