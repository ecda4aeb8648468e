import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sig

from vv_dsp_tpu.ops import fir as vfir

RTOL = 3e-3  # python/test_filters.py:32-33 parity contract
ATOL = 3e-3


def test_design_symmetry():
    # tests/filter_tests.c:7-15: h[i] == h[N-1-i]
    h = np.asarray(vfir.design_lowpass(63, 0.25))
    np.testing.assert_allclose(h, h[::-1], atol=1e-7)


def test_design_matches_reference_formula():
    num_taps, fc = 31, 0.2
    h = np.asarray(vfir.design_lowpass(num_taps, fc, "hamming"))
    n = np.arange(num_taps)
    m = n - (num_taps - 1) / 2.0
    ideal = 2 * fc * np.sinc(2 * fc * m)
    w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (num_taps - 1))
    np.testing.assert_allclose(h, ideal * w, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("num_taps", [8, 33, 101])
def test_apply_lfilter_parity(rng, num_taps):
    x = rng.standard_normal(512).astype(np.float32)
    h = np.asarray(vfir.design_lowpass(num_taps, 0.3)).astype(np.float64)
    ref = sig.lfilter(h, [1.0], x.astype(np.float64))
    got = np.asarray(vfir.fir_apply(jnp.asarray(h, dtype=jnp.float32), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_fft_path_equals_direct(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    h = np.asarray(vfir.design_lowpass(65, 0.25))
    a = np.asarray(vfir.fir_apply(jnp.asarray(h), jnp.asarray(x)))
    b = np.asarray(vfir.fir_apply_fft(jnp.asarray(h), jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=2e-4)


@pytest.mark.parametrize("block", [128, 256, 1000])
def test_overlap_save_equals_direct(rng, block):
    x = rng.standard_normal(3000).astype(np.float32)
    h = np.asarray(vfir.design_lowpass(101, 0.25))
    a = np.asarray(vfir.fir_apply(jnp.asarray(h), jnp.asarray(x)))
    b = np.asarray(vfir.fir_apply_os(jnp.asarray(h), jnp.asarray(x), block))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_filtfilt_zero_phase(rng):
    # zero-phase: a delayed impulse stays centered
    n = 256
    x = np.zeros(n, dtype=np.float32)
    x[128] = 1.0
    h = np.asarray(vfir.design_lowpass(31, 0.3))
    y = np.asarray(vfir.filtfilt_fir(jnp.asarray(h), jnp.asarray(x)))
    assert abs(int(np.argmax(y)) - 128) <= 1
    assert y.shape == (n,)


def test_filtfilt_matches_reference_algorithm(rng):
    # numpy mirror of src/filter/common.c:23-80
    x = rng.standard_normal(100).astype(np.float64)
    h = np.asarray(vfir.design_lowpass(9, 0.4)).astype(np.float64)
    pad = len(h) - 1
    ext = np.concatenate([x[:pad][::-1], x, x[-pad:][::-1]])
    t1 = sig.lfilter(h, [1.0], ext)
    t2 = sig.lfilter(h, [1.0], t1[::-1])[::-1]
    ref = t2[pad:-pad]
    got = np.asarray(
        vfir.filtfilt_fir(jnp.asarray(h, dtype=jnp.float32),
                          jnp.asarray(x, dtype=jnp.float32))
    )
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_batched_channels(rng):
    x = rng.standard_normal((4, 300)).astype(np.float32)
    h = np.asarray(vfir.design_lowpass(21, 0.25))
    y = np.asarray(vfir.fir_apply(jnp.asarray(h), jnp.asarray(x)))
    for i in range(4):
        ref = sig.lfilter(h.astype(np.float64), [1.0], x[i].astype(np.float64))
        np.testing.assert_allclose(y[i], ref, rtol=RTOL, atol=ATOL)


def test_mxu_short_signal_many_chunks(rng):
    """Regression: taps chunks > signal blocks once produced mis-shaped
    shifted windows (the flagship chain's 1024-tap FIR on short inputs)."""
    x = jnp.asarray(rng.standard_normal((2, 512)), dtype=jnp.float32)
    h = vfir.design_lowpass(1024, 0.45)
    got = vfir.fir_apply_mxu(h, x)
    want = vfir.fir_apply(h, x)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_filtfilt_short_signal_raises(rng):
    h = vfir.design_lowpass(9, 0.3)
    with pytest.raises(ValueError):
        vfir.filtfilt_fir(h, jnp.ones((4,)))
