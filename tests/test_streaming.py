"""Streaming parity: block-at-a-time processing with carried state must equal
the offline ops on the concatenated signal — the reference's cross-block
contract (FIR ring buffer src/filter/fir.c:160-196, IIR z-registers, STFT
frame streaming, streaming resampler)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu import streaming
from vv_dsp_tpu.ops import fir, iir, resample
from vv_dsp_tpu.ops.stft import STFT


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((3, 4096)), dtype=jnp.float32)


def _blocks(x, size):
    n = x.shape[-1]
    return [x[..., i : i + size] for i in range(0, n, size)]


@pytest.mark.parametrize("block", [64, 256, 1024])
@pytest.mark.parametrize("taps", [1, 31, 400])
def test_fir_stream(sig, block, taps):
    h = fir.design_lowpass(taps, 0.3) if taps > 1 else jnp.asarray([0.7])
    want = fir.fir_apply(h, sig)
    state = streaming.fir_stream_init(h, sig.shape[:-1])
    outs = []
    for blk in _blocks(sig, block):
        y, state = streaming.fir_stream_process(h, state, blk)
        outs.append(y)
    got = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("block", [128, 512])
def test_iir_stream(sig, block):
    sos = iir.butter_sos(6, 0.15)
    want = iir.iir_apply(sos, sig)
    state = streaming.iir_stream_init(sos, sig.shape[:-1])
    outs = []
    for blk in _blocks(sig, block):
        y, state = streaming.iir_stream_process(sos, state, blk)
        outs.append(y)
    got = jnp.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("block_hops", [1, 4, 16])
def test_stft_analysis_stream(sig, block_hops):
    nfft, hop = 512, 128
    st = streaming.StftStream(nfft, hop)
    plan = STFT(nfft, hop)
    want = plan.process(sig, rfft=True)
    state = st.analysis_init(sig.shape[:-1])
    outs = []
    for blk in _blocks(sig, block_hops * hop):
        s, state = st.analysis(state, blk)
        outs.append(s)
    got = jnp.concatenate(outs, axis=-2)
    # Streaming frame f covers [f*hop - (nfft-hop), f*hop + hop) globally =
    # offline frame f - (nfft/hop - 1); the first nfft/hop-1 streamed frames
    # are the zero-history warm-up.
    lag = nfft // hop - 1
    nf = min(want.shape[-2], got.shape[-2] - lag)
    np.testing.assert_allclose(got[..., lag : lag + nf, :],
                               want[..., :nf, :], rtol=1e-4, atol=1e-4)


def test_stft_roundtrip_stream(sig):
    nfft, hop = 512, 128
    st = streaming.StftStream(nfft, hop)
    a_state = st.analysis_init(sig.shape[:-1])
    s_state = st.synthesis_init(sig.shape[:-1])
    outs = []
    for blk in _blocks(sig, 4 * hop):
        spec, a_state = st.analysis(a_state, blk)
        y, s_state = st.synthesis(s_state, spec)
        outs.append(y)
    got = jnp.concatenate(outs, axis=-1)
    # Total latency analysis+synthesis = nfft - hop; compare the aligned
    # fully-overlapped interior.
    lat = nfft - hop
    n = sig.shape[-1]
    np.testing.assert_allclose(got[..., lat + nfft : n],
                               sig[..., nfft : n - lat], rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("up,down,block", [(2, 1, 300), (1, 2, 512),
                                           (4, 3, 384), (3, 4, 512),
                                           (160, 147, 1470)])
def test_resample_poly_stream(sig, up, down, block):
    rs = streaming.ResamplePolyStream(up, down)
    n = sig.shape[-1]
    n2 = (n // block) * block
    x = sig[..., :n2]
    want = resample.resample_poly(x, up, down)
    state = rs.init(x.shape[:-1])
    outs = []
    for blk in _blocks(x, block):
        y, state = rs.process(state, blk)
        outs.append(y)
    outs.append(rs.flush(state))
    got = jnp.concatenate(outs, axis=-1)
    lat = rs.latency_out
    np.testing.assert_allclose(got[..., lat : lat + want.shape[-1]], want,
                               rtol=2e-4, atol=2e-4)


def test_stft_stream_nonoverlapping(sig):
    """nfft == hop (zero overlap): carried state is EMPTY and every block's
    frames are that block's data (regression: a -0 slice once returned the
    whole buffer, duplicating stale frames and growing state unboundedly)."""
    nfft = hop = 256
    st = streaming.StftStream(nfft, hop)
    plan = STFT(nfft, hop)
    want = plan.process(sig, rfft=True)
    state = st.analysis_init(sig.shape[:-1])
    outs = []
    for blk in _blocks(sig, 4 * hop):
        s, state = st.analysis(state, blk)
        assert state.shape[-1] == 0
        outs.append(s)
    got = jnp.concatenate(outs, axis=-2)
    # offline emits one extra fully-zero tail frame when nfft == hop
    nf = min(want.shape[-2], got.shape[-2])
    np.testing.assert_allclose(np.asarray(got[..., :nf, :]),
                               np.asarray(want[..., :nf, :]), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(want[..., nf:, :]), 0.0, atol=1e-6)


def test_scan_stream_fir_matches_loop(sig):
    """scan_stream (K blocks in one dispatch) == the eager per-block loop,
    outputs and final state both, for a sample stream (out_axis=-1)."""
    h = fir.design_lowpass(101, 0.3)
    block = 512
    step = lambda s, blk: streaming.fir_stream_process(h, s, blk)

    state0 = streaming.fir_stream_init(h, sig.shape[:-1])
    state = state0
    outs = []
    for blk in _blocks(sig, block):
        y, state = step(state, blk)
        outs.append(y)
    want = jnp.concatenate(outs, axis=-1)

    got, end_state = streaming.scan_stream(step, state0, sig, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(end_state), np.asarray(state),
                               rtol=1e-6, atol=1e-6)


def test_scan_stream_frame_axis(sig):
    """out_axis=-2 folds per-block frame batches in order (STFT analysis)."""
    st = streaming.StftStream(256, 64)
    block = 4 * 64
    step = lambda s, blk: st.analysis(s, blk)
    state0 = st.analysis_init(sig.shape[:-1])
    state = state0
    outs = []
    for blk in _blocks(sig, block):
        spec, state = step(state, blk)
        outs.append(spec)
    want = jnp.concatenate(outs, axis=-2)
    got, end_state = streaming.scan_stream(step, state0, sig, block,
                                           out_axis=-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(end_state), np.asarray(state),
                               rtol=1e-6, atol=1e-6)


def test_scan_stream_validates_geometry(sig):
    with pytest.raises(ValueError):
        streaming.scan_stream(
            lambda s, b: (b, s), jnp.zeros(sig.shape[:-1] + (4,)),
            sig, 1000)  # 4096 % 1000 != 0
