"""Differentiability: every compute path is pure JAX, so gradients flow
through the full DSP chains — a capability the C reference cannot offer
(enables learned frontends, filter optimization, differentiable DSP)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir, iir, mel
from vv_dsp_tpu.ops.stft import STFT
from vv_dsp_tpu.models import MFCCFrontend


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((2, 2048)), dtype=jnp.float32)


def _finite_grad(f, x, eps=1e-3):
    g = jax.grad(f)(x)
    # check one coordinate against finite differences
    e = jnp.zeros_like(x).at[(0,) * x.ndim].set(eps)
    fd = (f(x + e) - f(x - e)) / (2 * eps)
    return g, float(fd)


def test_grad_through_fir_taps(sig):
    """Optimize filter coefficients by gradient — taps are differentiable."""
    h0 = fir.design_lowpass(31, 0.3)

    def loss(h):
        y = fir.fir_apply(h, sig)
        return jnp.mean(jnp.square(y))

    g, fd = _finite_grad(loss, h0)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[0]), fd, rtol=2e-2, atol=1e-4)


def test_grad_through_stft_roundtrip(sig):
    plan = STFT(256, 64)

    def loss(x):
        spec = plan.process(x, rfft=True)
        return jnp.mean(jnp.abs(spec))

    g = jax.grad(loss)(sig)
    assert g.shape == sig.shape and np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_grad_through_mfcc_pipeline(sig):
    model = MFCCFrontend(nfft=256, hop=64, n_mels=20, n_mfcc=10,
                         sample_rate=16000.0)

    def loss(x):
        return jnp.mean(jnp.square(model(x)))

    val, g = jax.value_and_grad(loss)(sig)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_grad_through_iir_scan(sig):
    """The associative-scan IIR is differentiable end to end."""
    sos = iir.butter_sos(2, 0.3)

    def loss(x):
        return jnp.mean(jnp.square(iir.iir_apply(sos, x)))

    g, fd = _finite_grad(loss, sig, eps=1e-2)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g[0, 0]), fd, rtol=5e-2, atol=1e-4)


def test_vmap_over_plans(rng):
    """Ops vmap over extra batch dims (the reference loops per channel)."""
    x = jnp.asarray(rng.standard_normal((3, 4, 512)), dtype=jnp.float32)
    plan = STFT(128, 32)
    direct = plan.process(x, rfft=True)
    vm = jax.vmap(lambda v: plan.process(v, rfft=True))(x)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(vm), rtol=1e-5,
                               atol=1e-5)
