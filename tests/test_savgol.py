import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sig

from vv_dsp_tpu.ops import savgol as vsg
from vv_dsp_tpu.utils.nan_policy import NanPolicy


def test_coeffs_match_scipy():
    for (w, p, d) in [(5, 2, 0), (11, 3, 0), (21, 4, 2), (9, 3, 1)]:
        ours = vsg.savgol_coeffs_np(w, p, d, delta=1.0)
        # scipy returns convolution coeffs; use='dot' gives correlation order
        ref = sig.savgol_coeffs(w, p, deriv=d, delta=1.0, use="dot")
        np.testing.assert_allclose(ours, ref, atol=1e-10)


@pytest.mark.parametrize("mode_ours,mode_scipy", [
    ("reflect", "mirror"),
    ("nearest", "nearest"),
    ("wrap", "wrap"),
])
def test_filter_scipy_parity(rng, mode_ours, mode_scipy):
    x = rng.standard_normal(200).astype(np.float32)
    got = np.asarray(vsg.savgol_filter(jnp.asarray(x), 11, 3, mode=mode_ours))
    ref = sig.savgol_filter(x.astype(np.float64), 11, 3, mode=mode_scipy)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_constant_mode_is_edge_replicate(rng):
    # reference CONSTANT == NEAREST (src/filter/savgol.c:176-180)
    x = rng.standard_normal(64).astype(np.float32)
    a = np.asarray(vsg.savgol_filter(jnp.asarray(x), 9, 2, mode="constant"))
    b = np.asarray(vsg.savgol_filter(jnp.asarray(x), 9, 2, mode="nearest"))
    np.testing.assert_allclose(a, b)


def test_derivative(rng):
    # derivative of a cubic is exact for polyorder >= 3
    t = np.linspace(-1, 1, 101)
    x = (t ** 3 - 0.5 * t).astype(np.float32)
    delta = t[1] - t[0]
    got = np.asarray(
        vsg.savgol_filter(jnp.asarray(x), 11, 3, deriv=1, delta=float(delta))
    )
    ref = 3 * t ** 2 - 0.5
    np.testing.assert_allclose(got[10:-10], ref[10:-10], atol=1e-4)


def test_polynomial_preservation(rng):
    # savgol preserves polynomials up to polyorder exactly
    t = np.linspace(0, 1, 80)
    x = (2.0 + 3.0 * t - t ** 2).astype(np.float32)
    got = np.asarray(vsg.savgol_filter(jnp.asarray(x), 9, 2))
    np.testing.assert_allclose(got[8:-8], x[8:-8], atol=1e-4)


def test_argument_validation():
    # mirrors tests/savgol_tests.c:14-45
    with pytest.raises(ValueError):
        vsg.savgol_coeffs_np(10, 3)  # even window
    with pytest.raises(ValueError):
        vsg.savgol_coeffs_np(5, 7)  # polyorder >= window
    with pytest.raises(ValueError):
        vsg.savgol_filter(jnp.zeros(300), 259, 2)  # window > 257


def test_nan_policy(rng):
    x = np.zeros(50, dtype=np.float32)
    x[10] = np.nan
    y = np.asarray(
        vsg.savgol_filter(jnp.asarray(x), 7, 2, nan_policy=NanPolicy.IGNORE)
    )
    assert np.isfinite(y).all()


def test_batched(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32)
    y = np.asarray(vsg.savgol_filter(jnp.asarray(x), 11, 3))
    for i in range(3):
        ref = sig.savgol_filter(x[i].astype(np.float64), 11, 3, mode="mirror")
        np.testing.assert_allclose(y[i], ref, rtol=1e-4, atol=1e-4)
