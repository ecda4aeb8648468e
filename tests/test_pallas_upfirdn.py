"""Banded-matmul upfirdn kernel (interpret mode on CPU): sample-exact vs the
gather reference for FIR, resampling, and the fused chain head."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir as _fir
from vv_dsp_tpu.ops import resample as rs
from vv_dsp_tpu.ops import pallas_upfirdn as pu


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((2, 5001)), dtype=jnp.float32)


@pytest.mark.parametrize("up,down", [(4, 3), (2, 1), (1, 2), (3, 4), (7, 5)])
def test_banded_resample_matches_gather(sig, up, down):
    want = rs.resample_poly(sig, up, down)
    h = rs._resample_poly_filter(up, down)
    n_out = -(-sig.shape[-1] * up // down)
    got = pu.upfirdn_banded_pallas(sig, h, up, down, (len(h) - 1) // 2,
                                   n_out, b_out=up * 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_banded_fir_matches_fir_apply(sig):
    h = _fir.design_lowpass_np(129, 0.3)
    want = _fir.fir_apply(jnp.asarray(h.astype(np.float32)), sig)
    got = pu.upfirdn_banded_pallas(sig, h, 1, 1, 0, sig.shape[-1], b_out=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_banded_fused_head_matches_composite(sig):
    """The kernel computes the pure composite upfirdn; fir_resample_fused's
    staged-tail recompute covers the last outputs (tested separately in
    test_resample via the fused-vs-staged parity)."""
    h = _fir.design_lowpass_np(256, 0.4)
    gf, off = rs._fused_fir_resample_filter(tuple(h.astype(np.float64)), 4, 3)
    n_out = -(-sig.shape[-1] * 4 // 3)
    want = rs._upfirdn_gather(gf, sig, 4, 3, off, n_out)
    got = pu.upfirdn_banded_pallas(sig, gf, 4, 3, off, n_out, b_out=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_banded_short_signal(rng):
    """n_out smaller than one segment still works (padding path)."""
    x = jnp.asarray(rng.standard_normal((1, 300)), dtype=jnp.float32)
    want = rs.resample_poly(x, 4, 3)
    h = rs._resample_poly_filter(4, 3)
    got = pu.upfirdn_banded_pallas(x, h, 4, 3, (len(h) - 1) // 2,
                                   want.shape[-1], b_out=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_b_out_and_gate():
    h = rs._resample_poly_filter(4, 3)
    assert pu.banded_supported(4, 3, len(h), (len(h) - 1) // 2)
    b = pu.pick_b_out(4, 3, len(h), (len(h) - 1) // 2)
    assert b is not None and b % 4 == 0
    # absurd filter: nothing fits
    assert not pu.banded_supported(1, 1, 10_000_000, 0)


def test_fused_head_dispatch_parity(sig):
    """fir_resample_fused (which routes to the banded kernel on TPU, tall
    einsum elsewhere) must stay sample-exact vs the staged pair everywhere,
    including the tail."""
    h = _fir.design_lowpass_np(256, 0.4).astype(np.float32)
    staged = rs.resample_poly(_fir.fir_apply(jnp.asarray(h), sig), 4, 3)
    fused = rs.fir_resample_fused(h, sig, 4, 3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(staged),
                               rtol=2e-4, atol=2e-4)


def test_halo_span_bound_rejected():
    """Halo rolls reach at most 128 neighbor lanes; geometries needing more
    (huge up with tiny b_in) must be refused, not silently wrapped (review
    finding: up=512 composite filters corrupted far segments)."""
    # up=512, down=1, composite ~300k taps -> b_in tiny, span enormous
    assert not pu.banded_supported(512, 1, 300_000, 150_000)


def test_fir_apply_best_traced_taps(rng):
    """Learned (traced) taps under jit must fall through to the XLA path
    instead of crashing on np.asarray (review finding)."""
    import jax
    from vv_dsp_tpu.ops import pallas_kernels as pk
    x = jnp.asarray(rng.standard_normal((2, 4000)), dtype=jnp.float32)
    h = jnp.asarray(rng.standard_normal(600), dtype=jnp.float32) * 0.01
    y = jax.jit(pk.fir_apply_best)(h, x)   # h traced inside jit
    want = _fir.fir_apply(h, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
