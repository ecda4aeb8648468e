import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu.ops import fft as vfft

RTOL = 5e-5  # python/test_fft.py:37-38 parity contract
ATOL = 5e-5


def test_fft_parity(rng):
    for n in (8, 64, 100, 1024):  # incl. non-pow2
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        np.testing.assert_allclose(
            vfft.fft(jnp.asarray(x)), np.fft.fft(x), rtol=RTOL, atol=ATOL * np.abs(
                np.fft.fft(x)).max()
        )


def test_ifft_scaling(rng):
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(np.complex64)
    y = vfft.ifft(vfft.fft(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, rtol=RTOL, atol=ATOL)


def test_rfft_irfft_roundtrip(rng):
    for n in (16, 64, 63, 1024):
        x = rng.standard_normal(n).astype(np.float32)
        spec = vfft.rfft(jnp.asarray(x))
        assert spec.shape[-1] == n // 2 + 1
        y = vfft.irfft(spec, n)
        np.testing.assert_allclose(y, x, rtol=RTOL, atol=ATOL)


def test_impulse_flat_spectrum():
    # tests/spectral_tests.c:22-31
    x = np.zeros(64, dtype=np.float32)
    x[0] = 1.0
    spec = np.asarray(vfft.fft(jnp.asarray(x).astype(jnp.complex64)))
    np.testing.assert_allclose(spec, np.ones(64, dtype=np.complex64), atol=1e-5)


def test_hermitian_expand(rng):
    for n in (16, 17):
        x = rng.standard_normal(n).astype(np.float32)
        full = np.asarray(vfft.hermitian_expand(vfft.rfft(jnp.asarray(x)), n))
        np.testing.assert_allclose(full, np.fft.fft(x), rtol=1e-4, atol=1e-4)


def test_fftshift_roundtrip(rng):
    for n in (8, 9):
        x = rng.standard_normal(n).astype(np.float32)
        y = vfft.ifftshift(vfft.fftshift(jnp.asarray(x)))
        np.testing.assert_allclose(y, x)
        np.testing.assert_allclose(vfft.fftshift(jnp.asarray(x)), np.fft.fftshift(x))


def test_phase_wrap():
    x = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi, 7.0])
    w = np.asarray(vfft.phase_wrap(x))
    assert np.all(w <= np.pi + 1e-6) and np.all(w > -np.pi - 1e-6)
    np.testing.assert_allclose(w[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[1], np.pi, atol=1e-6)
    np.testing.assert_allclose(w[3], np.pi, atol=1e-5)
    np.testing.assert_allclose(w[5], 7.0 - 2 * np.pi, atol=1e-5)


def test_phase_unwrap(rng):
    phase = np.cumsum(rng.uniform(0.0, 0.8, 200)).astype(np.float32)
    wrapped = np.angle(np.exp(1j * phase)).astype(np.float32)
    un = np.asarray(vfft.phase_unwrap(jnp.asarray(wrapped)))
    np.testing.assert_allclose(un, phase, atol=1e-3)
