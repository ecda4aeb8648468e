"""Randomized geometry sweeps vs scipy/numpy oracles — cheap fuzzing of the
shape/edge arithmetic across ops (fixed seed, deterministic)."""

import numpy as np
import pytest
import scipy.signal as sig
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir as vfir
from vv_dsp_tpu.ops import iir as viir
from vv_dsp_tpu.ops import resample as vrs
from vv_dsp_tpu.ops import savgol as vsg
from vv_dsp_tpu.ops.stft import STFT


def test_stft_roundtrip_random_geometries(rng):
    """Forward+reconstruct perfect reconstruction (mid region) across random
    (nfft, hop <= nfft/2, n) incl. ragged tails. (At hop == nfft the hann
    endpoints have zero window coverage — those samples are unrecoverable
    and the reference's norm guard zeroes them identically; verified, not a
    bug.)"""
    for _ in range(10):
        nfft = int(rng.choice([64, 96, 128, 256, 384, 512]))
        hop = int(rng.choice([d for d in range(16, nfft // 2 + 1)
                              if nfft % d == 0]))
        n = int(rng.integers(nfft, 6000))
        x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
        plan = STFT(nfft, hop)
        y = np.asarray(plan.reconstruct(plan.process(x, rfft=True), n,
                                        rfft=True))
        lo, hi = nfft, max(nfft, n - nfft)
        if hi > lo:
            err = np.abs(y[:, lo:hi] - np.asarray(x)[:, lo:hi]).max()
            assert err < 1e-4, (nfft, hop, n, err)


def test_iir_random_orders_vs_scipy(rng):
    """tf2sos + associative-scan apply vs scipy.signal.lfilter at random
    orders (the py-filters 3e-3 contract)."""
    for _ in range(8):
        order = int(rng.integers(1, 9))
        wn = float(rng.uniform(0.05, 0.45))
        b, a = sig.butter(order, wn)
        x = rng.standard_normal(2048).astype(np.float32)
        want = sig.lfilter(b, a, x.astype(np.float64))
        got = np.asarray(viir.lfilter(b, a, jnp.asarray(x)))
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        assert err < 3e-3, (order, wn, err)


def test_upfirdn_random_geometries_vs_scipy(rng):
    for _ in range(10):
        up = int(rng.integers(1, 12))
        down = int(rng.integers(1, 12))
        taps = int(rng.integers(1, 90))
        n = int(rng.integers(taps + 1, 4000))
        h = rng.standard_normal(taps)
        x = rng.standard_normal(n).astype(np.float32)
        want = sig.upfirdn(h, x.astype(np.float64), up, down)
        got = np.asarray(vrs.upfirdn_mxu(h, jnp.asarray(x), up, down))
        assert got.shape == want.shape, (up, down, taps, n)
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        assert err < 1e-4, (up, down, taps, n, err)


def test_savgol_random_windows_vs_scipy(rng):
    """Mode names follow the REFERENCE (np.pad vocabulary): ours 'reflect'
    is scipy's 'mirror', and ours 'constant' is edge-replicate (covered by
    the 'nearest' oracle row in test_savgol)."""
    for _ in range(8):
        wl = int(rng.integers(2, 40)) * 2 + 1
        poly = int(rng.integers(0, min(wl - 1, 6)))
        n = int(rng.integers(wl, 2000))
        ours, theirs = [("reflect", "mirror"), ("nearest", "nearest"),
                        ("wrap", "wrap")][int(rng.integers(0, 3))]
        x = rng.standard_normal(n).astype(np.float32)
        want = sig.savgol_filter(x.astype(np.float64), wl, poly, mode=theirs)
        got = np.asarray(vsg.savgol_filter(jnp.asarray(x), wl, poly,
                                           mode=ours))
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        assert err < 1e-3, (wl, poly, n, ours, err)


def test_fir_paths_agree_random(rng):
    """All four FIR apply paths agree on random geometries."""
    for _ in range(6):
        taps = int(rng.integers(1, 300))
        n = int(rng.integers(taps + 1, 5000))
        h = vfir.design_lowpass_np(taps, float(rng.uniform(0.05, 0.9))
                                   ).astype(np.float32) if taps > 1 else \
            np.asarray([0.7], np.float32)
        x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
        base = np.asarray(vfir.fir_apply(h, x))
        for f in (vfir.fir_apply_fft, vfir.fir_apply_os, vfir.fir_apply_mxu):
            got = np.asarray(f(h, x))
            assert got.shape == base.shape, (f.__name__, taps, n)
            err = np.abs(got - base).max() / max(1.0, np.abs(base).max())
            assert err < 2e-4, (f.__name__, taps, n, err)
