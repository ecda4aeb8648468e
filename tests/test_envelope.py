import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu.ops import envelope as ve


def test_impulse_cepstrum_near_zero():
    # tests/envelope_tests.c:9-38: impulse cepstrum ~ 0
    n = 64
    x = np.zeros(n, dtype=np.float32)
    x[0] = 1.0
    c = np.asarray(ve.cepstrum_real(jnp.asarray(x)))
    assert np.abs(c).max() < 1e-4


def test_minphase_reconstruction_unit_impulse():
    # impulse -> cepstrum -> min-phase reconstruction: xr[0] ~ 1
    n = 64
    x = np.zeros(n, dtype=np.float32)
    x[0] = 1.0
    c = ve.cepstrum_real(jnp.asarray(x))
    xr = np.asarray(ve.icepstrum_minphase(c))
    assert abs(xr[0] - 1.0) < 1e-3


def test_lpc_ar1(rng):
    # AR(1): x[t] = 0.9 x[t-1] + e -> a1 ~ -0.9 (tests/envelope_tests.c)
    n = 8192
    e = rng.standard_normal(n)
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.9 * x[t - 1] + e[t]
    a, err = ve.lpc(jnp.asarray(x, dtype=jnp.float32), 1)
    a = np.asarray(a)
    assert abs(a[1] + 0.9) < 0.2, a
    assert float(err) > 0


def test_levinson_matches_direct_solve(rng):
    # Levinson solution == Toeplitz normal-equation solve
    x = rng.standard_normal(2048).astype(np.float64)
    order = 8
    r = np.array([(x[: len(x) - k] * x[k:]).sum() for k in range(order + 1)])
    import scipy.linalg
    R = scipy.linalg.toeplitz(r[:order])
    a_ref = np.linalg.solve(R, -r[1 : order + 1])
    a, _ = ve.levinson(jnp.asarray(r, dtype=jnp.float32), order)
    a = np.asarray(a)
    np.testing.assert_allclose(a[1:], a_ref, rtol=5e-2, atol=5e-3)


def test_lpspec_matches_reference_formula(rng):
    # numpy mirror of vv_dsp_lpspec (lpc.c:55-72): gain / |1 - sum a_m e^{jm t}|
    # (NB the reference's sign convention: it SUBTRACTS a_m * e^{+jm theta},
    # preserved exactly.)
    x = rng.standard_normal(2048)
    a, err = ve.lpc(jnp.asarray(x, dtype=jnp.float32), 6)
    a_np = np.asarray(a, dtype=np.float64)
    gain = float(np.sqrt(max(float(err), 1e-12)))
    nfft = 128
    ref = np.zeros(nfft)
    for k in range(nfft):
        theta = 2 * np.pi * k / nfft
        re, im = 1.0, 0.0
        for m in range(1, 7):
            re += a_np[m] * (-np.cos(m * theta))
            im += a_np[m] * (-np.sin(m * theta))
        den = np.sqrt(re * re + im * im)
        ref[k] = gain / den if den > 0 else 0.0
    got = np.asarray(ve.lpspec(a, jnp.asarray(gain, dtype=jnp.float32), nfft))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_lp_envelope_peak_at_resonance(rng):
    # Physics check with the STANDARD evaluation |gain / A(e^{-j w})|,
    # A(z) = 1 + sum a_m z^-m: AR(2) resonance recovered at f0.
    n = 16384
    theta = 2 * np.pi * 0.1
    r = 0.95
    a1, a2 = -2 * r * np.cos(theta), r * r
    e = rng.standard_normal(n)
    x = np.zeros(n)
    for t in range(2, n):
        x[t] = -a1 * x[t - 1] - a2 * x[t - 2] + e[t]
    a, err = ve.lpc(jnp.asarray(x, dtype=jnp.float32), 2)
    a_np = np.asarray(a, dtype=np.float64)
    nfft = 256
    w = 2 * np.pi * np.arange(nfft // 2) / nfft
    A = 1 + a_np[1] * np.exp(-1j * w) + a_np[2] * np.exp(-2j * w)
    peak_bin = int(np.argmax(1.0 / np.abs(A)))
    assert abs(peak_bin / nfft - 0.1) < 0.02, peak_bin


def test_batched(rng):
    x = rng.standard_normal((4, 128)).astype(np.float32)
    c = ve.cepstrum_real(jnp.asarray(x))
    assert c.shape == (4, 128)
    a, err = ve.lpc(jnp.asarray(x), 4)
    assert a.shape == (4, 5) and err.shape == (4,)


def test_lpc_silent_input_no_nans():
    """Silent input: the reference errors (lpc.c:25); we return zeros
    instead of NaNs."""
    a, e = ve.lpc(jnp.zeros(256), 10)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a[1:]), 0.0)
