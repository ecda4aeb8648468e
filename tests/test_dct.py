import numpy as np
import jax.numpy as jnp
import pytest

from vv_dsp_tpu.ops import dct as vdct
from vv_dsp_tpu.utils.nan_policy import NanPolicy

SIZES = [7, 8, 63, 64, 257]  # python/test_dct.py:44 sweep incl. non-pow2


def ref_dct2_forward(x):
    n = len(x)
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return (np.cos(np.pi * (m + 0.5) * k / n) * x[None, :]).sum(1)


def ref_dct2_backward(X):
    n = len(X)
    out = np.zeros(n)
    for m in range(n):
        s = 0.5 * X[0]
        for k in range(1, n):
            s += X[k] * np.cos(np.pi * k * (m + 0.5) / n)
        out[m] = 2.0 / n * s
    return out


def ref_dct3_forward(x):
    n = len(x)
    out = np.zeros(n)
    for k in range(n):
        s = x[0]
        for m in range(1, n):
            s += 2.0 * x[m] * np.cos(np.pi * k * (m + 0.5) / n)
        out[k] = s
    return out


def ref_dct4(x, inverse=False):
    n = len(x)
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    out = (np.cos(np.pi * (m + 0.5) * (k + 0.5) / n) * x[None, :]).sum(1)
    return out * (2.0 / n) if inverse else out


@pytest.mark.parametrize("n", SIZES)
def test_dct2_forward_reference_convention(rng, n):
    x = rng.standard_normal(n)
    got = np.asarray(vdct.dct(jnp.asarray(x, dtype=jnp.float32), type=2))
    np.testing.assert_allclose(got, ref_dct2_forward(x), rtol=1e-4,
                               atol=1e-4 * max(1, n) ** 0.5)


@pytest.mark.parametrize("n", SIZES)
def test_dct2_roundtrip(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    y = vdct.dct(vdct.dct(xj, type=2), type=2, inverse=True)
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [8, 63])
def test_dct3_forward_reference_convention(rng, n):
    x = rng.standard_normal(n)
    got = np.asarray(vdct.dct(jnp.asarray(x, dtype=jnp.float32), type=3))
    np.testing.assert_allclose(got, ref_dct3_forward(x), rtol=1e-4, atol=1e-3)


def test_dct3_backward_matches_reference_kernel(rng):
    X = rng.standard_normal(16)
    got = np.asarray(vdct.dct(jnp.asarray(X, dtype=jnp.float32), type=3, inverse=True))
    np.testing.assert_allclose(got, ref_dct2_backward(X), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [8, 64])
def test_dct4_involution(rng, n):
    # tests/dct_tests.c:11-49: DCT-IV self-inverse with 2/N scaling
    x = rng.standard_normal(n).astype(np.float32)
    y = vdct.dct(vdct.dct(jnp.asarray(x), type=4), type=4, inverse=True)
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_large_pow2_fft_path(rng):
    x = rng.standard_normal(4096)
    got = np.asarray(vdct.dct2_forward(jnp.asarray(x, dtype=jnp.float32)))
    import scipy.fft
    ref = scipy.fft.dct(x, type=2) / 2.0  # scipy's is 2x the reference's
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-3)


def test_nan_policy_ignore():
    x = jnp.asarray([1.0, np.nan, 2.0, np.inf], dtype=jnp.float32)
    y = vdct.dct(x, type=2, nan_policy=NanPolicy.IGNORE)
    assert np.isfinite(np.asarray(y)).all()


def test_batched(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    got = np.asarray(vdct.dct(jnp.asarray(x), type=2))
    for i in range(4):
        np.testing.assert_allclose(got[i], ref_dct2_forward(x[i].astype(np.float64)),
                                   rtol=1e-4, atol=1e-4)


def test_backward_fft_path_large_pow2(rng):
    """The inverse/DCT-III fast paths must agree with the matmul form."""
    from vv_dsp_tpu.ops import dct as d
    n = d._FFT_THRESHOLD  # first size where the fast path engages
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    fwd = d.dct2_forward(x)
    back = d.dct2_backward(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3,
                               atol=1e-3)
    # The fast backward path must equal the explicit 2/N-weighted matmul
    # (the reference's dct3_inverse_from_ii, which III-backward also routes
    # to — intentionally NOT the true DCT-III inverse, dct.c:112-119).
    X = np.asarray(fwd, dtype=np.float64)
    w = np.full(n, 2.0 / n); w[0] = 1.0 / n
    mat = d._dct2_matrix(n) * w[:, None]
    want = X @ mat
    np.testing.assert_allclose(np.asarray(back), want, rtol=2e-4, atol=2e-4)
