"""C++ data-plane tests: native implementations must agree with the Python /
JAX ones (which are themselves golden-tested against reference semantics)."""

import ctypes
from pathlib import Path

import numpy as np
import pytest

from audio_to_midi_tpu import native
from audio_to_midi_tpu.config import SAMPLE_RATE, TransformSettings
from audio_to_midi_tpu.data import audio_io, labels, synthetic
from audio_to_midi_tpu.ops import rasterize
from tests.golden import golden_extract_events, golden_stitch_probs

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_audio")
    events = synthetic.random_events(2.0, 6, seed=11)
    audio = synthetic.synth_performance(events, 2.0)
    path = d / "s.wav"
    audio_io.write_wav(path, audio, SAMPLE_RATE)
    return path, audio, events


def test_decode_matches_python(wav):
    path, audio, _ = wav
    ours = native.decode_audio(path, SAMPLE_RATE)
    ref = audio_io.decode_audio(path, SAMPLE_RATE)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_decode_resample(tmp_path):
    t = np.arange(8000) / 8000.0
    x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32) * 0.5
    audio_io.write_wav(tmp_path / "x.wav", x, 8000)
    y = native.decode_audio(tmp_path / "x.wav", 16000)
    ref = audio_io.decode_audio(tmp_path / "x.wav", 16000)
    assert abs(y.shape[1] - 16000) < 20
    # Different polyphase implementations; compare in the interior at tolerance
    n = min(y.shape[1], ref.shape[1])
    np.testing.assert_allclose(y[:, 200 : n - 200], ref[:, 200 : n - 200], atol=5e-3)


def test_normalize_matches(wav):
    _, audio, _ = wav
    ours = native.normalize_loudness(audio)
    ref = audio_io.normalize_loudness_np(audio)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_cached_load(wav, tmp_path, monkeypatch):
    path, _, _ = wav
    monkeypatch.setenv("SAMPLE_CACHE_DIR", str(tmp_path / "c"))
    a1 = native.load_audio_sample(path, SAMPLE_RATE)
    files = list((tmp_path / "c").rglob("*.a2mc"))
    assert len(files) == 1
    a2 = native.load_audio_sample(path, SAMPLE_RATE)
    np.testing.assert_array_equal(a1, a2)
    files[0].write_bytes(b"junk")
    a3 = native.load_audio_sample(path, SAMPLE_RATE)
    np.testing.assert_array_equal(a1, a3)


def test_f16_bulk_converters_exhaustive():
    """The SIMD (F16C) bulk converters must match IEEE RNE bit-for-bit:
    f16->f32 over ALL 65536 half values; f32->f16 over rounding-boundary,
    subnormal, overflow and random values (numpy is the IEEE oracle)."""
    allh = np.arange(65536, dtype=np.uint16).view(np.float16)
    got = native.f16_to_f32_buf(allh)
    want = allh.astype(np.float32)
    # F16C quiets signaling-NaN payloads where numpy preserves them; NaNs
    # never occur in audio, so bit-equality is required for every non-NaN
    # half and NaN->NaN for the rest.
    nan_in = np.isnan(allh)
    assert np.array_equal(
        got.view(np.uint32)[~nan_in], want.view(np.uint32)[~nan_in]
    )
    assert np.all(np.isnan(got[nan_in]))

    rng = np.random.default_rng(0)
    f = np.concatenate([
        rng.standard_normal(100000).astype(np.float32),
        rng.standard_normal(1000).astype(np.float32) * 1e-7,  # subnormal f16
        rng.standard_normal(1000).astype(np.float32) * 1e5,   # overflow
        np.float32([0.0, -0.0, np.inf, -np.inf, 65504.0, 65520.0, 65519.99,
                    5.960464e-8, 2.980232e-8, 2.9802326e-8, 6.103515e-5]),
        # exact ties around representable halves exercise round-to-even
        np.float32([1.0009765625, 1.00048828125, 1.00146484375]),
    ])
    got16 = native.f32_to_f16_buf(f)
    want16 = f.astype(np.float16)
    assert np.array_equal(got16.view(np.uint16), want16.view(np.uint16))


def test_load_full_audio_native_routing(wav, monkeypatch):
    """load_full_audio / load_full_audio_f16 via the native plane must be
    bit-identical to the numpy decode->normalize->f16 chain, and must not
    touch the sample cache (python.rs:373-394: no cache read — or write)."""
    from audio_to_midi_tpu.data import loader

    path, _, _ = wav
    import tempfile as _tf

    with _tf.TemporaryDirectory() as cd:
        monkeypatch.setenv("SAMPLE_CACHE_DIR", cd)
        a = loader.load_full_audio(path, SAMPLE_RATE)
        a16 = loader.load_full_audio_f16(path, SAMPLE_RATE)
        assert not any(Path(cd).rglob("*.a2mc")), "load_full_audio wrote cache"
    monkeypatch.delenv("SAMPLE_CACHE_DIR")
    ref = audio_io.normalize_loudness_np(
        audio_io.decode_audio(str(path), SAMPLE_RATE)
    ).astype(np.float16)
    assert np.array_equal(a16.view(np.uint16), ref.view(np.uint16))
    assert np.array_equal(a, ref.astype(np.float32))


def test_load_full_audio_f16_numpy_fallback(wav, monkeypatch):
    """With the native plane disabled, load_full_audio_f16 must fall back to
    the numpy chain and still produce identical f16 bits."""
    import importlib

    path, _, _ = wav
    from audio_to_midi_tpu.data import loader

    want = loader.load_full_audio_f16(path, SAMPLE_RATE)  # native
    monkeypatch.setattr(loader, "_use_native", lambda: False)
    got = loader.load_full_audio_f16(path, SAMPLE_RATE)  # numpy fallback
    assert np.array_equal(got.view(np.uint16), want.view(np.uint16))


def test_csv_parse_matches(tmp_path):
    p = tmp_path / "l.csv"
    p.write_text(
        "% header\n0.0,0.0,21,0.0\n1.0, 0.5, 60, 0.73\n2.005, 0.001, 21, 1.0\n"
    )
    ours = native.parse_events_csv(p, 0.02)
    ref = labels.parse_events_csv(p, 0.02)
    assert ours == ref


def test_rasterize_matches():
    events = [(5, 2, 10, 7), (20, 2, 4, 7), (3, 0, 50, 7)]
    ours = native.rasterize_events(events, 40, 0, 35, num_keys=4)
    ref = rasterize.rasterize_events_np(events, 40, 0, 35, num_keys=4)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stitch_matches_golden():
    rng = np.random.default_rng(1)
    probs = rng.random((4, 250, 8)).astype(np.float32)
    ours = native.stitch_probs(probs, 0.5, 0.02)
    ref = golden_stitch_probs(probs, 0.5, 0.02)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_extract_events_matches_golden(seed):
    from tests.test_ops import _make_probs

    probs = _make_probs(seed)
    assert native.extract_events(probs) == golden_extract_events(probs)


def test_transform_for_training_runs():
    rng = np.random.default_rng(3)
    audio = np.ascontiguousarray(rng.standard_normal((8, 2, 500)), np.float32)
    lab = np.ascontiguousarray(rng.random((8, 20, 90)), np.float32)
    before_a = audio.copy()
    settings = TransformSettings()
    native.transform_for_training(audio, lab, settings, seed=42)
    assert not np.array_equal(audio, before_a)
    assert lab.min() >= settings.label_smoothing_alpha - 1e-7
    assert lab.max() <= 1 - settings.label_smoothing_alpha + 1e-7
    # deterministic per seed
    audio2, lab2 = before_a.copy(), np.ascontiguousarray(rng.random((8, 20, 90)), np.float32)


def test_mobile_c_abi(wav):
    """extract_midi_events over a strided f16 array (cbinds.rs parity)."""
    lib = native._load()

    class MultiArray3(ctypes.Structure):
        _fields_ = [
            ("strides", ctypes.c_uint64 * 3),
            ("dims", ctypes.c_uint64 * 3),
            ("data", ctypes.c_void_p),
        ]

    class MidiEvent(ctypes.Structure):
        _fields_ = [
            ("attack_time", ctypes.c_uint64),
            ("note", ctypes.c_uint8),
            ("duration", ctypes.c_uint64),
            ("velocity", ctypes.c_uint8),
        ]

    class MidiEventList(ctypes.Structure):
        _fields_ = [
            ("ptr", ctypes.POINTER(MidiEvent)),
            ("length", ctypes.c_size_t),
            ("capacity", ctypes.c_size_t),
        ]

    lib.extract_midi_events.restype = ctypes.POINTER(MidiEventList)
    lib.extract_midi_events.argtypes = [MultiArray3, ctypes.c_double, ctypes.c_double]
    lib.free_midi_events.argtypes = [ctypes.POINTER(MidiEventList)]

    probs = np.zeros((2, 50, 4), np.float16)
    probs[0, 10:20, 1] = 0.9  # one clear note
    arr = np.ascontiguousarray(probs)
    ma = MultiArray3()
    ma.dims = (ctypes.c_uint64 * 3)(2, 50, 4)
    ma.strides = (ctypes.c_uint64 * 3)(200, 4, 1)
    ma.data = arr.ctypes.data_as(ctypes.c_void_p)

    out = lib.extract_midi_events(ma, 0.0, 0.02)
    assert out
    events = [
        (out.contents.ptr[i].attack_time, out.contents.ptr[i].note,
         out.contents.ptr[i].duration, out.contents.ptr[i].velocity)
        for i in range(out.contents.length)
    ]
    lib.free_midi_events(out)
    assert (10, 1, 10, 7) in events
