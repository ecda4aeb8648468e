import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu.ops import stats


def test_basic_reductions(rng):
    x = rng.standard_normal(500).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(stats.sum_(xj), x.sum(), rtol=1e-5)
    np.testing.assert_allclose(stats.mean(xj), x.mean(), rtol=1e-5)
    np.testing.assert_allclose(stats.var(xj), x.var(), rtol=1e-4)
    np.testing.assert_allclose(stats.rms(xj), np.sqrt((x ** 2).mean()), rtol=1e-5)
    mn, mx = stats.peak(xj)
    assert mn == x.min() and mx == x.max()
    np.testing.assert_allclose(
        stats.crest_factor(xj), np.abs(x).max() / np.sqrt((x ** 2).mean()),
        rtol=1e-5,
    )


def test_cumsum_diff_clamp(rng):
    x = rng.standard_normal(64).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(stats.cumsum(xj), np.cumsum(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats.diff(xj), np.diff(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats.clamp(xj, -0.5, 0.5), np.clip(x, -0.5, 0.5))


def test_zero_crossings():
    x = jnp.asarray([1.0, -1.0, 1.0, 0.0, 1.0, -2.0])
    # crossings: 1->-1, -1->1, 1->-2 (zero breaks the strict conditions)
    assert int(stats.zero_crossing_count(x)) == 3


def test_skew_kurtosis(rng):
    x = rng.standard_normal(4000).astype(np.float64)
    xj = jnp.asarray(x, dtype=jnp.float32)
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    np.testing.assert_allclose(stats.skewness(xj), m3 / m2 ** 1.5, atol=1e-3)
    np.testing.assert_allclose(stats.kurtosis(xj), m4 / m2 ** 2 - 3, atol=1e-3)


def test_autocorrelation_unbiased(rng):
    # parity oracle: python/test_stats.py manual unbiased autocorr, tol 1e-4
    x = rng.standard_normal(256).astype(np.float32)
    maxlag = 32
    ref = np.array([
        (x[: len(x) - k] * x[k:]).sum() / (len(x) - k) for k in range(maxlag + 1)
    ])
    r = stats.autocorrelation(jnp.asarray(x), maxlag, biased=False)
    np.testing.assert_allclose(r, ref, rtol=1e-4, atol=1e-4)


def test_autocorrelation_biased(rng):
    x = rng.standard_normal(100).astype(np.float32)
    ref = np.array([(x[: 100 - k] * x[k:]).sum() / 100 for k in range(11)])
    r = stats.autocorrelation(jnp.asarray(x), 10, biased=True)
    np.testing.assert_allclose(r, ref, rtol=1e-4, atol=1e-4)


def test_cross_correlation(rng):
    x = rng.standard_normal(120).astype(np.float32)
    y = rng.standard_normal(150).astype(np.float32)
    maxlag = 20
    ref = []
    for lag in range(maxlag + 1):
        acc, cnt = 0.0, 0
        for i in range(len(x)):
            j = i + lag
            if j < len(y):
                acc += x[i] * y[j]
                cnt += 1
        ref.append(acc / cnt if cnt else 0.0)
    r = stats.cross_correlation(jnp.asarray(x), jnp.asarray(y), maxlag)
    np.testing.assert_allclose(r, np.array(ref), rtol=1e-4, atol=1e-4)


def test_batched(rng):
    x = rng.standard_normal((3, 4, 100)).astype(np.float32)
    assert stats.rms(jnp.asarray(x)).shape == (3, 4)
    assert stats.autocorrelation(jnp.asarray(x), 5).shape == (3, 4, 6)


def test_kahan_sum(rng):
    from vv_dsp_tpu.ops.stats import kahan_sum
    # pathological case: large value plus many tiny ones
    x = np.full(100001, 1e-4, dtype=np.float32)
    x[0] = 1e7
    got = float(kahan_sum(jnp.asarray(x)))
    want = float(np.sum(x.astype(np.float64)))
    assert abs(got - want) / want < 1e-6
    # matches plain sum on benign data, any shape/axis
    y = rng.standard_normal((4, 1000)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(kahan_sum(jnp.asarray(y))),
                               y.astype(np.float64).sum(-1), rtol=1e-6,
                               atol=1e-6)


def test_complex_ops(rng):
    from vv_dsp_tpu.ops import complex_ops as C
    a = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
         ).astype(np.complex64)
    b = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
         ).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(jnp.real(C.cpx_mul(
        jnp.asarray(a), jnp.asarray(b)))), (a * b).real, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(C.cpx_abs(jnp.asarray(a))),
                               np.abs(a), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(C.cpx_phase(jnp.asarray(a))),
                               np.angle(a), rtol=1e-5, atol=1e-5)
    back = C.cpx_from_polar(C.cpx_abs(jnp.asarray(a)),
                            C.cpx_phase(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(jnp.real(back)), a.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.imag(back)), a.imag, atol=1e-5)
