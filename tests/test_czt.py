import numpy as np
import jax.numpy as jnp
import scipy.signal as sig

from vv_dsp_tpu.ops import czt as vczt

RTOL = 2e-4  # python/test_czt.py:39-40 parity contract
ATOL = 2e-4


def test_czt_equals_dft(rng):
    # tests/czt_tests.c:10-36: A=1, W=exp(-2j pi / N) -> DFT
    n = 64
    x = rng.standard_normal(n).astype(np.float32)
    w = np.exp(-2j * np.pi / n)
    got = np.asarray(vczt.czt(jnp.asarray(x), n, w, 1.0))
    ref = np.fft.fft(x)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())


def test_czt_scipy_parity(rng):
    n, m = 50, 37
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    w = np.exp(-2j * np.pi * 0.013)
    a = np.exp(2j * np.pi * 0.21)
    got = np.asarray(vczt.czt(jnp.asarray(x), m, w, a))
    ref = sig.czt(x.astype(np.complex128), m, w, a)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=RTOL * np.abs(ref).max())


def test_czt_zoom_band(rng):
    # python/test_czt.py 800-1200 Hz zoom analog
    fs = 8000.0
    n = 256
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    m = 128
    got = np.asarray(vczt.czt_range(jnp.asarray(x), 800.0, 1200.0, m, fs))
    w, a = vczt.czt_params_for_freq_range(800.0, 1200.0, m, fs)
    ref = sig.czt(x.astype(np.float64), m, w, a)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3 * np.abs(ref).max())
    # NB: the reference's param helper uses phi0 = -2 pi f_start / fs
    # (czt.c:33-36), which sweeps NEGATIVE frequencies -800..-1200 Hz; with
    # the physical A = exp(+2j pi f_start/fs) the peak lands at 1000 Hz:
    zoom = np.asarray(vczt.czt(jnp.asarray(x), m, w, np.conj(a)))
    freqs = 800.0 + np.arange(m) * (400.0 / m)
    assert abs(freqs[np.argmax(np.abs(zoom))] - 1000.0) < 10.0


def test_czt_spiral_contour(rng):
    # |W| != 1 exercises the mag/angle decomposition (czt.c:84-111)
    n, m = 20, 16
    x = rng.standard_normal(n).astype(np.float32)
    w = 1.01 * np.exp(-2j * np.pi / 24)
    a = 0.98 * np.exp(2j * np.pi * 0.05)
    got = np.asarray(vczt.czt(jnp.asarray(x), m, w, a))
    # direct O(NM) evaluation
    k = np.arange(m)[:, None]
    nn = np.arange(n)[None, :]
    ref = ((a ** (-nn)) * (w ** (nn * k)) * x[None, :]).sum(1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())


def test_batched(rng):
    x = rng.standard_normal((3, 32)).astype(np.float32)
    w = np.exp(-2j * np.pi / 32)
    got = np.asarray(vczt.czt(jnp.asarray(x), 32, w))
    ref = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())
