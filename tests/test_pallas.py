"""Pallas kernels (interpret mode on CPU) must be numerically identical to
their XLA counterparts in vv_dsp_tpu.ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir, resample, pallas_kernels as pk


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
