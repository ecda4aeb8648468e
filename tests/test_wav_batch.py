"""Batch WAV loader: native thread-pool decode vs per-file reads, error
isolation, prefetch overlap."""

import numpy as np
import pytest

from vv_dsp_tpu.io import read_wav, write_wav, read_wav_batch, \
    prefetch_batches
from vv_dsp_tpu.io import batch as wbatch
from vv_dsp_tpu.io import wav as wio


@pytest.fixture
def corpus(tmp_path):
    """12 WAVs with mixed lengths, rates, formats and channel counts."""
    rng = np.random.default_rng(7)
    paths, want = [], []
    fmts = [16, 24, 32, 0]
    for i in range(12):
        ch = int(rng.integers(1, 3))
        n = int(rng.integers(100, 5000))
        sr = int(rng.choice([8000, 16000, 48000]))
        x = rng.uniform(-0.9, 0.9, (ch, n)).astype(np.float32)
        p = tmp_path / f"f{i}.wav"
        write_wav(str(p), x, sr, format=fmts[i % 4])
        back, _ = read_wav(str(p))  # oracle incl. quantization
        paths.append(str(p))
        want.append((back, sr))
    return paths, want


def _check(batch, want, channels, capacity):
    assert batch.data.shape == (len(want), channels, capacity)
    assert batch.ok
    for i, (x, sr) in enumerate(want):
        nf = min(x.shape[1], capacity)
        assert batch.frames[i] == nf
        assert batch.rates[i] == sr
        ch = min(x.shape[0], channels)
        np.testing.assert_array_equal(batch.data[i, :ch, :nf], x[:ch, :nf])
        # zero padding beyond the file's frames and channels
        assert not batch.data[i, :, nf:].any()
        assert not batch.data[i, ch:, :].any()


def test_batch_matches_single_reads(corpus):
    paths, want = corpus
    batch = read_wav_batch(paths)
    capacity = max(x.shape[1] for x, _ in want)
    channels = max(x.shape[0] for x, _ in want)
    _check(batch, want, channels, capacity)


def test_batch_explicit_geometry_truncates_and_pads(corpus):
    paths, want = corpus
    batch = read_wav_batch(paths, capacity_frames=1000, channels=1,
                           n_threads=3)
    _check(batch, want, 1, 1000)


def test_batch_fallback_backend_matches_native(corpus, monkeypatch):
    paths, want = corpus
    native = read_wav_batch(paths)
    monkeypatch.setattr(wio, "_get_lib", lambda: None)
    fallback = read_wav_batch(paths)
    np.testing.assert_array_equal(native.data, fallback.data)
    np.testing.assert_array_equal(native.frames, fallback.frames)
    np.testing.assert_array_equal(native.rates, fallback.rates)


@pytest.mark.parametrize("native", [True, False])
def test_batch_bad_file_is_isolated(corpus, tmp_path, monkeypatch, native):
    if not native:
        monkeypatch.setattr(wio, "_get_lib", lambda: None)
    paths, want = corpus
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVEgarbage")
    mixed = paths[:3] + [str(bad)] + paths[3:]
    batch = read_wav_batch(mixed)
    assert not batch.ok
    assert batch.frames[3] == -1
    assert batch.rates[3] == 0
    assert not batch.data[3].any()
    good = [i for i in range(len(mixed)) if i != 3]
    assert (batch.frames[good] >= 0).all()
    x0, sr0 = want[0]
    np.testing.assert_array_equal(
        batch.data[0, :x0.shape[0], :x0.shape[1]], x0)


def test_prefetch_batches_yields_all_in_order(corpus):
    paths, want = corpus
    chunks = [paths[:5], paths[5:9], paths[9:]]
    got = list(prefetch_batches(chunks, capacity_frames=2000, channels=2,
                                depth=2))
    assert [g.paths for g in got] == [tuple(c) for c in chunks]
    for g in got:
        assert g.data.shape[1:] == (2, 2000)
    np.testing.assert_array_equal(
        got[0].data[0], read_wav_batch(paths[:1], 2000, 2).data[0])


def test_empty_and_undecodable_batches_raise(tmp_path):
    with pytest.raises(ValueError):
        read_wav_batch([])
    bad = tmp_path / "junk.wav"
    bad.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_wav_batch([str(bad)])  # geometry probe finds nothing decodable


def test_single_read_rejects_channel_mismatch(tmp_path):
    """The strict-channel guard: vv_wav_read_f32 must refuse a file whose
    channel count differs from the caller's allocation instead of writing
    past it."""
    lib = wio._get_lib()
    if lib is None:
        pytest.skip("native codec unavailable")
    import ctypes
    p = tmp_path / "st.wav"
    write_wav(str(p), np.zeros((2, 64), np.float32), 8000)
    out = np.empty((1, 64), np.float32)
    rc = lib.vv_wav_read_f32(
        str(p).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        64, 1)  # claim 1 channel for a 2-channel file
    assert rc == -1
