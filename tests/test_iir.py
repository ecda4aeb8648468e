import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sig

from vv_dsp_tpu.ops import iir as viir

RTOL = 3e-3  # python/test_filters.py parity contract
ATOL = 3e-3


def test_identity_biquad(rng):
    # tests/filter_tests.c:41-61: pass-through cascade
    x = rng.standard_normal(128).astype(np.float32)
    y = np.asarray(viir.biquad_apply(jnp.asarray(x), 1.0, 0.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_single_biquad_lfilter_parity(rng):
    x = rng.standard_normal(512).astype(np.float32)
    b = [0.2, 0.3, 0.1]
    a = [1.0, -0.5, 0.2]
    ref = sig.lfilter(b, a, x.astype(np.float64))
    got = np.asarray(viir.biquad_apply(jnp.asarray(x), 0.2, 0.3, 0.1, -0.5, 0.2))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_sosfilt_parity_butterworth(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    sos = sig.butter(6, 0.3, output="sos")
    ref = sig.sosfilt(sos, x.astype(np.float64))
    got = np.asarray(viir.iir_apply(sos, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_long_signal_stability(rng):
    x = rng.standard_normal(65536).astype(np.float32)
    sos = sig.butter(4, 0.2, output="sos")
    ref = sig.sosfilt(sos, x.astype(np.float64))
    got = np.asarray(viir.iir_apply(sos, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_lfilter_first_order(rng):
    x = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(viir.lfilter([1.0, -0.4], [1.0, -0.9], jnp.asarray(x)))
    ref = sig.lfilter([1.0, -0.4], [1.0, -0.9], x.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def _freq_response_match(sos_a, sos_b, atol=1e-6):
    w, h_a = sig.sosfreqz(np.asarray(sos_a), worN=512)
    _, h_b = sig.sosfreqz(np.asarray(sos_b), worN=512)
    np.testing.assert_allclose(h_a, h_b, atol=atol)


@pytest.mark.parametrize("order", [2, 3, 4, 6])
@pytest.mark.parametrize("btype", ["lowpass", "highpass"])
def test_butter_design_vs_scipy(order, btype):
    ours = viir.butter_sos(order, 0.3, btype)
    ref = sig.butter(order, 0.3, btype, output="sos")
    _freq_response_match(ours, ref, atol=1e-8)


@pytest.mark.parametrize("order", [2, 4, 5])
def test_cheby1_design_vs_scipy(order):
    ours = viir.cheby1_sos(order, 1.0, 0.25)
    ref = sig.cheby1(order, 1.0, 0.25, output="sos")
    _freq_response_match(ours, ref, atol=1e-8)


@pytest.mark.parametrize("order", [2, 4])
def test_cheby2_design_vs_scipy(order):
    ours = viir.cheby2_sos(order, 40.0, 0.25)
    ref = sig.cheby2(order, 40.0, 0.25, output="sos")
    _freq_response_match(ours, ref, atol=1e-8)


def test_designed_cascade_end_to_end(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    sos = viir.butter_sos(4, 0.2)
    ref = sig.sosfilt(sig.butter(4, 0.2, output="sos"), x.astype(np.float64))
    got = np.asarray(viir.iir_apply(sos, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_batched(rng):
    x = rng.standard_normal((3, 256)).astype(np.float32)
    sos = sig.butter(4, 0.3, output="sos")
    got = np.asarray(viir.iir_apply(sos, jnp.asarray(x)))
    for i in range(3):
        ref = sig.sosfilt(sos, x[i].astype(np.float64))
        np.testing.assert_allclose(got[i], ref, rtol=RTOL, atol=ATOL)


def test_long_signal_stability(rng):
    """SURVEY hard-part #1: the f32 associative scan must hold scipy parity
    over long blocks, including narrow near-DC filters."""
    x = rng.standard_normal(200_000).astype(np.float32)
    for wn, order in ((0.05, 6), (0.01, 4)):
        sos = viir.butter_sos(order, wn)
        want = sig.sosfilt(np.asarray(sos, np.float64),
                           x.astype(np.float64))
        got = np.asarray(viir.iir_apply(sos, jnp.asarray(x)))
        err = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert err < 3e-3, (wn, order, err)
