import numpy as np
import pytest
import scipy.signal.windows as sw

from vv_dsp_tpu.ops.window import get_window_np, get_window, WINDOW_NAMES

SIZES = [1, 2, 7, 8, 64, 257]

# Windows whose reference formulas coincide with scipy's symmetric variants.
SCIPY_EQUIV = {
    "boxcar": lambda n: sw.boxcar(n),
    "hann": lambda n: sw.hann(n, sym=True),
    "hamming": lambda n: sw.general_hamming(n, 0.54, sym=True),
    "blackman": lambda n: sw.blackman(n, sym=True),
    "bartlett": lambda n: sw.bartlett(n, sym=True),
    "bohman": lambda n: sw.bohman(n, sym=True),
    "flattop": lambda n: sw.flattop(n, sym=True),
    "kaiser": lambda n: sw.kaiser(n, 9.0, sym=True),
    "nuttall": lambda n: sw.nuttall(n, sym=True),
    "blackman_harris": lambda n: sw.blackmanharris(n, sym=True),
}


@pytest.mark.parametrize("name", sorted(SCIPY_EQUIV))
@pytest.mark.parametrize("n", SIZES)
def test_scipy_parity(name, n):
    w = get_window_np(name, n)
    ref = SCIPY_EQUIV[name](n)
    np.testing.assert_allclose(w, ref, rtol=1e-6, atol=2e-7)


@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_n1_is_one(name):
    assert get_window_np(name, 1).tolist() == [1.0]


@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_symmetric_and_bounded(name):
    w = get_window_np(name, 65)
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
    assert w.max() <= 1.0 + 1e-6  # flattop center sums to 1.000000003
    assert abs(w.max() - 1.0) < 0.25  # peak near 1 for all 13


def test_tukey_reference_formula():
    # The reference's right-taper condition is n >= N - taper (not N-1-taper),
    # asymmetric by one sample vs scipy (src/window/window.c:249-278); we
    # preserve reference semantics exactly.
    for n in (7, 64, 65):
        taper = 0.5 * (n - 1) / 2.0
        ref = np.ones(n)
        for k in range(n):
            if k < taper:
                ref[k] = 0.5 * (1 - np.cos(np.pi * k / taper))
            elif k >= n - taper:
                ref[k] = 0.5 * (1 - np.cos(np.pi * (n - 1 - k) / taper))
        np.testing.assert_allclose(get_window_np("tukey", n), ref, atol=1e-12)


def test_cosine_reference_formula():
    # reference cosine = sin(pi n/(N-1)) (differs from scipy's)
    n = 33
    k = np.arange(n)
    np.testing.assert_allclose(
        get_window_np("cosine", n), np.sin(np.pi * k / (n - 1)), atol=1e-12
    )


def test_planck_reference_formula():
    # Mirror of src/window/window.c:150-185. NB the reference's taper
    # expression x = 2*eps*(n/N - eps/2) is NEGATIVE over the whole left
    # taper, so exp(2e/x - 2e/(e-x)) ~ 0 and the "taper" stays ~1 — a
    # reference quirk preserved bug-for-bug.
    n, eps = 100, 0.1
    taper = eps * n / 2.0
    ref = np.ones(n)
    for k in range(n):
        if k < taper:
            x = 2 * eps * (k / n - eps / 2)
            ref[k] = 0.0 if x == 0 else 1 / (1 + np.exp(2 * eps / x - 2 * eps / (eps - x)))
        elif k >= n - taper:
            x = 2 * eps * ((n - 1 - k) / n - eps / 2)
            ref[k] = 0.0 if x == 0 else 1 / (1 + np.exp(2 * eps / x - 2 * eps / (eps - x)))
    w = get_window_np("planck_taper", n)
    np.testing.assert_allclose(w, ref, atol=1e-12)
    assert np.all(w[10:90] == 1.0)


def test_jnp_dtype():
    w = get_window("hann", 64)
    assert str(w.dtype) == "float32"
