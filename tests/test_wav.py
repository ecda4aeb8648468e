"""WAV codec: roundtrips across formats, native<->numpy backend agreement,
scipy.io.wavfile cross-validation (the reference validates its WAV module
against known files; we validate against scipy's reader/writer)."""

import numpy as np
import pytest

from vv_dsp_tpu.io import wav as wavmod
from vv_dsp_tpu.io import read_wav, write_wav, wav_info


@pytest.fixture
def stereo(rng):
    t = np.arange(4801) / 48000.0
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.25 * np.sin(2 * np.pi * 1000 * t)]).astype(np.float32)
    return x


@pytest.mark.parametrize("fmt,tol", [(16, 2e-4), (24, 2e-6), (32, 1e-7),
                                     (0, 0.0)])
def test_roundtrip(tmp_path, stereo, fmt, tol):
    p = str(tmp_path / "t.wav")
    write_wav(p, stereo, 48000, format=fmt)
    info = wav_info(p)
    assert (info.sample_rate, info.channels, info.frames) == (48000, 2, 4801)
    assert info.is_float == (fmt == 0)
    back, sr = read_wav(p)
    assert sr == 48000 and back.shape == stereo.shape
    np.testing.assert_allclose(back, stereo, atol=tol if tol else 1e-9)


def test_native_and_numpy_backends_agree(tmp_path, stereo):
    if wavmod._get_lib() is None:
        pytest.skip("no native toolchain")
    for fmt in (16, 24, 32, 0):
        p = str(tmp_path / f"t{fmt}.wav")
        write_wav(p, stereo, 48000, format=fmt)  # native write
        native, _ = read_wav(p)  # native read
        numpy_read, _ = wavmod._read_np(p)
        np.testing.assert_array_equal(native, numpy_read)
        # and numpy write == native-readable
        p2 = str(tmp_path / f"n{fmt}.wav")
        wavmod._write_np(p2, stereo, 48000, fmt)
        with open(p, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read()


def test_scipy_cross_validation(tmp_path, stereo):
    wavfile = pytest.importorskip("scipy.io.wavfile")
    p = str(tmp_path / "t.wav")
    write_wav(p, stereo, 44100, format=16)
    sr, data = wavfile.read(p)
    assert sr == 44100 and data.shape == (4801, 2)
    np.testing.assert_allclose(data / 32768.0, stereo.T, atol=2e-4)
    # scipy-written float32 -> our reader
    p2 = str(tmp_path / "s.wav")
    wavfile.write(p2, 22050, stereo.T.copy())
    back, sr2 = read_wav(p2)
    assert sr2 == 22050
    np.testing.assert_allclose(back, stereo, atol=1e-7)


def test_mono_1d_and_errors(tmp_path):
    p = str(tmp_path / "m.wav")
    x = np.linspace(-0.9, 0.9, 1000, dtype=np.float32)
    write_wav(p, x, 8000, format=24)
    back, sr = read_wav(p)
    assert back.shape == (1, 1000) and sr == 8000
    np.testing.assert_allclose(back[0], x, atol=2e-6)
    with pytest.raises(ValueError):
        write_wav(p, x, 8000, format=12)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(bad)


def test_extreme_values_clip(tmp_path):
    p = str(tmp_path / "c.wav")
    x = np.array([[1.5, -1.5, 1.0, -1.0, 0.0]], dtype=np.float32)
    write_wav(p, x, 8000, format=16)
    back, _ = read_wav(p)
    assert back.max() <= 1.0 and back.min() >= -1.0
    np.testing.assert_allclose(back[0, :2], [32767 / 32768.0, -1.0], atol=1e-6)


def test_malformed_files_rejected(tmp_path):
    """Truncated/hostile headers must error cleanly, not crash or hang."""
    import struct
    # header claims more data than the file holds
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 1000) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16))
        f.write(b"data" + struct.pack("<I", 1000))
        f.write(b"\x00" * 10)  # only 10 of the claimed 1000 bytes
    with pytest.raises(ValueError):
        read_wav(p)
    # zero channels in fmt
    p2 = str(tmp_path / "zch.wav")
    with open(p2, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 0, 8000, 0, 0, 16))
        f.write(b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        wav_info(p2)
    # fmt chunk missing entirely
    p3 = str(tmp_path / "nofmt.wav")
    with open(p3, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 12) + b"WAVE")
        f.write(b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError):
        read_wav(p3)


def test_odd_payload_pad_byte(tmp_path):
    """24-bit mono with odd frame count: data chunk is odd-sized, the file
    must carry the RIFF pad byte and still roundtrip."""
    x = np.linspace(-0.5, 0.5, 1001, dtype=np.float32)
    p = str(tmp_path / "odd.wav")
    write_wav(p, x, 8000, format=24)
    size = len(open(p, "rb").read())
    assert size % 2 == 0  # word-aligned
    back, sr = read_wav(p)
    np.testing.assert_allclose(back[0], x, atol=2e-6)


def test_wav_fuzz_random_and_mutated(tmp_path):
    """Deterministic fuzz: random garbage, truncations, and byte-flips of a
    valid WAV must raise a Python error (never crash the process or return
    silently) in BOTH backends."""
    from vv_dsp_tpu.io import wav as wio
    rng = np.random.default_rng(99)
    # a valid seed file to mutate
    seed_path = tmp_path / "seed.wav"
    wio.write_wav(str(seed_path), rng.standard_normal(256).astype(np.float32),
                  8000)
    seed = seed_path.read_bytes()

    cases = []
    for i in range(60):  # pure garbage of various sizes
        cases.append(rng.integers(0, 256, int(rng.integers(0, 400)),
                                  dtype=np.uint8).tobytes())
    for i in range(60):  # truncations of the valid file
        cases.append(seed[: int(rng.integers(0, len(seed)))])
    for i in range(80):  # byte flips (headers included)
        b = bytearray(seed)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))

    p = tmp_path / "fuzz.wav"
    survived = 0
    for i, payload in enumerate(cases):
        p.write_bytes(payload)
        for reader in (wio.read_wav, wio._read_np):
            try:
                out, sr = reader(str(p))
                # a mutated-but-still-parseable file is fine as long as the
                # result is well-formed
                assert isinstance(out, np.ndarray) and out.ndim == 2
                assert sr > 0
                survived += 1
            except (ValueError, EOFError, OSError, KeyError,
                    NotImplementedError, ZeroDivisionError, MemoryError):
                pass  # loud rejection is the expected outcome
    # sanity: the harness exercised real parses (some byte-flips survive)
    assert survived > 0
