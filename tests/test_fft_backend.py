"""Matmul-DFT backend parity vs numpy (the backend-consistency test tier of
the reference, tests/gtest/test_fft.cpp:322-360: every backend must agree
with the reference backend within tolerance)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu.ops import fft as F


@pytest.fixture
def matmul_backend():
    F.set_fft_backend("matmul")
    yield
    F.set_fft_backend("auto")


@pytest.mark.parametrize("n", [7, 16, 63, 64, 257, 1024])
def test_matmul_backend_matches_numpy(matmul_backend, rng, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(F.rfft(jnp.asarray(x))),
        np.fft.rfft(x.astype(np.float64)), rtol=5e-5, atol=5e-5)
    xh = np.fft.rfft(x.astype(np.float64)).astype(np.complex64)
    np.testing.assert_allclose(
        np.asarray(F.irfft(jnp.asarray(xh), n)), x, rtol=5e-5, atol=5e-5)
    xc = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
          ).astype(np.complex64)
    np.testing.assert_allclose(
        np.asarray(F.fft(jnp.asarray(xc))),
        np.fft.fft(xc.astype(np.complex128)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(F.ifft(jnp.asarray(xc))),
        np.fft.ifft(xc.astype(np.complex128)), rtol=1e-4, atol=1e-4)


def test_backend_switch_and_padding(matmul_backend, rng):
    assert F.get_fft_backend() == "matmul"
    x = rng.standard_normal(50).astype(np.float32)
    # n-argument pad/trim semantics match numpy in both backends
    want = np.fft.rfft(x, n=64)
    np.testing.assert_allclose(np.asarray(F.rfft(jnp.asarray(x), n=64)),
                               want, rtol=5e-5, atol=5e-5)
    F.set_fft_backend("xla")
    np.testing.assert_allclose(np.asarray(F.rfft(jnp.asarray(x), n=64)),
                               want, rtol=5e-5, atol=5e-5)
    with pytest.raises(ValueError):
        F.set_fft_backend("fftw")


def test_integer_input_matmul_backend(matmul_backend):
    """Backend-independent behavior: integer input works on the matmul path
    (regression: the basis was cast to int32, truncating cos/sin)."""
    x = jnp.arange(16)
    np.testing.assert_allclose(np.asarray(F.fft(x)), np.fft.fft(np.arange(16)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(F.rfft(x)),
                               np.fft.rfft(np.arange(16)), rtol=1e-4,
                               atol=1e-4)


def test_backend_introspection_and_cache_flush(rng):
    """is_backend_available + clear_plan_cache (the reference's
    vv_dsp_fft_is_backend_available / vv_dsp_fft_flush_fftw_cache surface)."""
    import numpy as np
    import jax.numpy as jnp
    from vv_dsp_tpu.ops import fft as vfft
    from vv_dsp_tpu.ops.complex_ops import cpx_from_device
    assert vfft.is_backend_available("xla")
    assert vfft.is_backend_available("matmul")
    assert vfft.is_backend_available("auto")
    assert not vfft.is_backend_available("fftw")
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    vfft.set_fft_backend("matmul")
    try:
        a = np.asarray(cpx_from_device(vfft.fft(x)))
        assert vfft._dft_basis.cache_info().currsize > 0
        vfft.clear_plan_cache()
        assert vfft._dft_basis.cache_info().currsize == 0
        b = np.asarray(cpx_from_device(vfft.fft(x)))  # rebuilds cleanly
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
    finally:
        vfft.set_fft_backend("auto")


@pytest.mark.parametrize("backend", ["matmul", "xla"])
def test_universal_dispatch_consumers_honor_backend(rng, backend):
    """Every transform consumer routes through ops.fft — the reference's
    single plan vtable (src/spectral/fft.c:95-124): CZT (czt.c:140-154),
    Hilbert (hilbert.c:28-33), cepstrum (cepstrum.c:20-35), min-phase,
    FFT-domain DCT and FFT FIR apply must produce backend-independent
    results AND actually honor set_fft_backend (no jnp.fft bypass)."""
    import jax
    from vv_dsp_tpu.ops import czt as vczt
    from vv_dsp_tpu.ops import hilbert as vhil
    from vv_dsp_tpu.ops import envelope as venv
    from vv_dsp_tpu.ops import dct as vdct
    from vv_dsp_tpu.ops import fir as vfir

    n = 256
    x = rng.standard_normal((2, n)).astype(np.float32)
    xj = jnp.asarray(x)
    h = vfir.design_lowpass_np(31, 0.3).astype(np.float32)

    surfaces = {
        "czt": lambda: np.asarray(
            jnp.stack([jnp.real(r), jnp.imag(r)])
            if jnp.iscomplexobj(r := vczt.czt(
                xj, n, np.exp(-2j * np.pi / n), 1.0 + 0j)) else r),
        "hilbert": lambda: np.asarray(jnp.abs(vhil.hilbert_analytic(xj))),
        "cepstrum": lambda: np.asarray(venv.cepstrum_real(xj)),
        "minphase": lambda: np.asarray(
            venv.icepstrum_minphase(venv.cepstrum_real(xj))),
        "dct_fft": lambda: np.asarray(vdct.dct(xj, type=2)),
        "fir_fft": lambda: np.asarray(vfir.fir_apply_fft(jnp.asarray(h), xj)),
    }
    try:
        F.set_fft_backend("auto")
        ref = {k: fn() for k, fn in surfaces.items()}
        F.set_fft_backend(backend)
        for k, fn in surfaces.items():
            got = fn()
            scale = max(1.0, np.abs(ref[k]).max())
            assert np.abs(got - ref[k]).max() / scale < 5e-5, (k, backend)
    finally:
        F.set_fft_backend("auto")


def test_no_jnp_fft_outside_dispatch():
    """Source-level guard for the universal dispatch: jnp.fft appears only
    inside ops/fft.py (the dispatch itself).  Mirrors the reference where
    no consumer calls a backend directly."""
    import os
    import vv_dsp_tpu

    pkg = os.path.dirname(vv_dsp_tpu.__file__)
    offenders = []
    for root, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            if rel == os.path.join("ops", "fft.py"):
                continue
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if "jnp.fft" in code and '"""' not in line \
                            and "jnp.fft" not in line.split('"""')[-1:][0] \
                            or False:
                        offenders.append(f"{rel}:{i}")
    assert not offenders, offenders
