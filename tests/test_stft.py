import numpy as np
import jax.numpy as jnp
import pytest

from vv_dsp_tpu.ops.stft import STFT, power_spectrogram_onesided


def _roundtrip(x, nfft, hop, window="hann"):
    plan = STFT(nfft, hop, window)
    spec = plan.process(jnp.asarray(x))
    return np.asarray(plan.reconstruct(spec, len(x)))


def test_roundtrip_north_star_config1():
    # north-star config 1: 1024-pt FFT + Hann STFT roundtrip on a 1 kHz sine,
    # parity within 5e-5 (matches dump_stft_roundtrip + python/test_stft.py)
    fs = 48000.0
    n = 48000
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = _roundtrip(x, 1024, 256)
    # interior: full window overlap (norm > 0 everywhere there)
    err = np.abs(y[1024:-1024] - x[1024:-1024]).max()
    assert err < 5e-5, err


@pytest.mark.parametrize("nfft,hop", [(256, 64), (512, 256), (2048, 512)])
def test_roundtrip_sizes(rng, nfft, hop):
    x = rng.standard_normal(nfft * 8).astype(np.float32)
    y = _roundtrip(x, nfft, hop)
    mse = float(np.mean((y[nfft:-nfft] - x[nfft:-nfft]) ** 2))
    assert mse < 1e-8, mse  # far tighter than the reference's 1e-2 bound


def test_forward_matches_manual_frame_fft(rng):
    nfft, hop = 64, 16
    x = rng.standard_normal(256).astype(np.float32)
    plan = STFT(nfft, hop, "hann")
    spec = np.asarray(plan.process(jnp.asarray(x)))
    w = np.asarray(plan.win)
    nf = plan.num_frames(256)
    assert spec.shape == (nf, nfft)
    for f in range(nf):
        seg = np.zeros(nfft, dtype=np.float32)
        chunk = x[f * hop : f * hop + nfft]
        seg[: len(chunk)] = chunk
        ref = np.fft.fft(seg * w)
        np.testing.assert_allclose(spec[f], ref, atol=2e-4)


def test_rfft_mode(rng):
    nfft, hop = 128, 32
    x = rng.standard_normal(512).astype(np.float32)
    plan = STFT(nfft, hop)
    full = np.asarray(plan.process(jnp.asarray(x)))
    half = np.asarray(plan.process(jnp.asarray(x), rfft=True))
    np.testing.assert_allclose(half, full[..., : nfft // 2 + 1], atol=1e-4)
    y_full = plan.reconstruct(jnp.asarray(full), 512)
    y_half = plan.reconstruct(jnp.asarray(half), 512, rfft=True)
    # edges have tiny OLA norm -> relative amplification of fp error
    np.testing.assert_allclose(y_half, y_full, atol=1e-3)
    np.testing.assert_allclose(y_half[64:-64], y_full[64:-64], atol=1e-5)


def test_frame_count_short_signal():
    plan = STFT(64, 16)
    assert plan.num_frames(10) == 1
    spec = plan.process(jnp.zeros(10, dtype=jnp.float32))
    assert spec.shape == (1, 64)


def test_spectrogram_magnitude(rng):
    x = rng.standard_normal(400).astype(np.float32)
    plan = STFT(128, 64)
    mag = np.asarray(plan.spectrogram(jnp.asarray(x)))
    assert (mag >= 0).all()


def test_power_spectrogram_onesided(rng):
    x = rng.standard_normal(512).astype(np.float32)
    p = power_spectrogram_onesided(x, 128, 64)
    assert p.shape[-1] == 65


def test_hop_validation():
    with pytest.raises(ValueError):
        STFT(64, 65)


def test_batched_channels(rng):
    x = rng.standard_normal((3, 512)).astype(np.float32)
    plan = STFT(128, 64)
    spec = plan.process(jnp.asarray(x))
    y = np.asarray(plan.reconstruct(spec, 512))
    assert y.shape == (3, 512)
    ref = np.asarray(plan.reconstruct(plan.process(jnp.asarray(x[1])), 512))
    np.testing.assert_allclose(y[1], ref, atol=1e-6)


@pytest.mark.parametrize("window,hop_div", [("hann", 2), ("hann", 4),
                                            ("hamming", 2), ("boxcar", 1),
                                            ("blackman", 4)])
def test_cola_perfect_reconstruction(rng, window, hop_div):
    """COLA property sweep (gtest tier, tests/gtest/test_stft.cpp:452): for
    windows satisfying constant-overlap-add at the given hop, the w^2-
    normalized roundtrip reconstructs interior samples to float precision."""
    nfft = 256
    hop = nfft // hop_div
    x = jnp.asarray(rng.standard_normal(4096), dtype=jnp.float32)
    plan = STFT(nfft, hop, window)
    spec = plan.process(x, rfft=True)
    y = plan.reconstruct(spec, 4096, rfft=True)
    np.testing.assert_allclose(np.asarray(y[nfft:-nfft]),
                               np.asarray(x[nfft:-nfft]), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("nfft,hop", [(4, 2), (8, 8), (16, 4)])
def test_minimal_sizes(rng, nfft, hop):
    """Minimal-size lifecycle (gtest 'minimal sizes' tier)."""
    x = jnp.asarray(rng.standard_normal(64), dtype=jnp.float32)
    plan = STFT(nfft, hop)
    spec = plan.process(x, rfft=True)
    assert spec.shape[-1] == nfft // 2 + 1
    y = plan.reconstruct(spec, 64, rfft=True)
    assert y.shape[-1] == 64 and np.isfinite(np.asarray(y)).all()


def test_invalid_params():
    with pytest.raises(ValueError):
        STFT(0, 1)
    with pytest.raises(ValueError):
        STFT(64, 0)
    with pytest.raises(ValueError):
        STFT(64, 65)


def test_reconstruct_parts_matches_reconstruct(rng):
    """Matmul c2r inverse from (re, im) parts vs the complex reconstruct.
    The first/last hop samples divide by a near-zero hann w^2 norm (w^2[1]
    ~ 9e-6) which amplifies f32 rounding ~1e5x — the reference's
    normalization guard has the same conditioning — so the edge region
    gets a proportionally looser bound."""
    plan = STFT(1024, 256)
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    re, im = plan.power_parts(x)
    spec = plan.process(x, rfft=True)
    a = np.asarray(plan.reconstruct_parts(re, im, 8000))
    b = np.asarray(plan.reconstruct(spec, 8000, rfft=True))
    hop = 256
    scale = np.abs(b).max()
    assert np.abs(a - b)[:, hop:-hop].max() / scale < 1e-5
    assert np.abs(a - b)[:, :hop].max() / scale < 5e-2
    assert np.abs(a - b)[:, -hop:].max() / scale < 5e-2


def test_spectral_gate_parts_path_matches_complex(rng):
    """Force the direct tier (matmul backend) so the parts-form SpectralGate
    runs on CPU, and compare against the complex-spectrum path."""
    from vv_dsp_tpu.models.pipeline import SpectralGate
    from vv_dsp_tpu.ops import fft as vfft
    g = SpectralGate()
    x = jnp.asarray(rng.standard_normal((2, 20000)).astype(np.float32))
    want = np.asarray(g(x))  # complex-spectrum path (xla backend)
    vfft.set_fft_backend("matmul")
    try:
        assert g.stft_plan.supports_direct()
        got = np.asarray(g(x))
    finally:
        vfft.set_fft_backend("auto")
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-5
    assert np.abs(got - want).max() / scale < 5e-2


def test_spectrogram_direct_matches_complex(rng):
    """Framing-free two-sided magnitude spectrogram (direct tier) vs
    |process| — even and odd nfft."""
    from vv_dsp_tpu.ops import fft as vfft
    for nfft, hop in [(1024, 256), (27, 9)]:
        plan = STFT(nfft, hop)
        x = jnp.asarray(rng.standard_normal((2, 5000)).astype(np.float32))
        want = np.asarray(jnp.abs(plan.process(x)))
        vfft.set_fft_backend("matmul")
        try:
            assert plan.supports_direct()
            got = np.asarray(plan.spectrogram(x))
        finally:
            vfft.set_fft_backend("auto")
        assert got.shape == want.shape
        assert np.abs(got - want).max() / want.max() < 1e-5


def test_spectrogram_complex_input_uses_c2c(rng):
    """Complex input must NOT take the real-input direct path (its
    Hermitian mirror and r2c cast are real-only) — regression for the
    silent-wrong-magnitudes bug."""
    from vv_dsp_tpu.ops import fft as vfft
    plan = STFT(64, 16)
    z = jnp.asarray((rng.standard_normal((2, 1000))
                     + 1j * rng.standard_normal((2, 1000))
                     ).astype(np.complex64))
    want = np.asarray(jnp.abs(plan.process(z)))
    vfft.set_fft_backend("matmul")
    try:
        got = np.asarray(plan.spectrogram(z))
        # power() is an rfft-semantics op: complex input must raise loudly
        # (it used to take the direct path and return silent garbage)
        with pytest.raises((ValueError, TypeError)):
            np.asarray(plan.power(z))
    finally:
        vfft.set_fft_backend("auto")
    assert np.abs(got - want).max() / want.max() < 1e-5
