"""Pallas kernels (interpret mode on CPU) must be numerically identical to
their XLA counterparts in vv_dsp_tpu.ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir, resample, pallas_kernels as pk
from vv_dsp_tpu.ops.stft import STFT


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((3, 3000)), dtype=jnp.float32)


@pytest.mark.parametrize("taps", [1, 7, 33, 129])
def test_fir_pallas_matches_xla(sig, taps):
    h = fir.design_lowpass(taps, 0.3) if taps > 1 else jnp.asarray([0.5])
    want = fir.fir_apply(h, sig)
    got = pk.fir_apply_pallas(h, sig, block_t=512)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (4, 3), (3, 4), (7, 5)])
def test_resample_poly_pallas_matches_xla(sig, up, down):
    n = sig.shape[-1] // down * down
    x = sig[..., :n]
    want = resample.resample_poly(x, up, down)
    got = pk.resample_poly_pallas(x, up, down, q_tile=64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fir_pallas_odd_shapes(rng):
    # channel count not a multiple of the tile, length not a multiple of block
    x = jnp.asarray(rng.standard_normal((5, 777)), dtype=jnp.float32)
    h = fir.design_lowpass(21, 0.2)
    np.testing.assert_allclose(pk.fir_apply_pallas(h, x, block_t=256),
                               fir.fir_apply(h, x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nfft,hop,win,n", [(2048, 512, "hann", 48000),
                                            (1024, 256, "hamming", 10000),
                                            (1024, 1024, "hann", 5000),
                                            (2048, 512, "hann", 1000)])
def test_stft_power_pallas_matches_stft(rng, nfft, hop, win, n):
    """Fused framing+windowed-DFT+|.|^2 kernel vs the STFT plan path,
    including short-signal (n < nfft) tail zero-pad."""
    x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    plan = STFT(nfft, hop, win)
    want = np.asarray(plan.power(x))
    got = np.asarray(pk.stft_power_pallas(x, nfft, hop, win))
    assert got.shape == want.shape
    assert np.abs(got - want).max() / max(want.max(), 1e-9) < 1e-5


def test_stft_power_pallas_rejects_bad_geometry(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    with pytest.raises(ValueError):
        pk.stft_power_pallas(x, 1000, 250)  # hop not 128-aligned
    with pytest.raises(ValueError):
        pk.stft_power_pallas(x, 2048, 640)  # hop does not divide nfft
