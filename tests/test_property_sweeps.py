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


def test_czt_random_spirals_vs_scipy(rng):
    """Random Bluestein spirals (m, w, a) vs scipy.signal.czt at the py-czt
    2e-4 contract."""
    from vv_dsp_tpu.ops import czt as vczt
    for _ in range(8):
        n = int(rng.integers(8, 700))
        m = int(rng.integers(4, 500))
        theta = float(rng.uniform(0, 2 * np.pi / max(m, 1)))
        # |w| != 1 raises r^(k^2/2) to exp(ln r * (n+m)^2 / 2): bound the
        # exponent to ~5 so the chirp dynamic range stays within f32 —
        # beyond that the f32 reference (and any f32 Bluestein) loses all
        # precision, and far beyond even scipy's f64 overflows to inf
        r = 1.0 + float(rng.uniform(-1, 1)) * 10.0 / (n + m) ** 2
        w = r * np.exp(-1j * theta)
        a = np.exp(1j * float(rng.uniform(0, 2 * np.pi)))
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        want = sig.czt(x.astype(np.complex128), m, w, a)
        got = np.asarray(vczt.czt(jnp.asarray(x), m, complex(w), complex(a)))
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        assert err < 2e-4, (n, m, w, a, err)


def test_lpc_random_orders_vs_levinson_oracle(rng):
    """LPC via our levinson vs solving the Toeplitz normal equations in
    f64 (the textbook oracle) at random orders."""
    import scipy.linalg as sla
    from vv_dsp_tpu.ops import envelope as venv
    for _ in range(6):
        order = int(rng.integers(2, 16))
        n = int(rng.integers(order * 8, 4000))
        # AR-ish signal so the autocorrelation is well-conditioned
        x = sig.lfilter([1.0], [1.0, -0.6, 0.2],
                        rng.standard_normal(n)).astype(np.float32)
        a_got, err_got = venv.lpc(jnp.asarray(x), order)
        r = np.correlate(x.astype(np.float64), x.astype(np.float64),
                         "full")[n - 1: n + order] / n
        a_want = sla.solve_toeplitz((r[:-1], r[:-1]), -r[1:])
        err = np.abs(np.asarray(a_got)[1:] - a_want).max()
        assert err < 1e-3, (order, n, err)


def test_windows_random_sizes_vs_scipy(rng):
    """All scipy-comparable windows at random sizes (the reference's
    periodic=False symmetric convention)."""
    from vv_dsp_tpu.ops.window import get_window_np
    pairs = [("hann", "hann"), ("hamming", "hamming"),
             ("blackman", "blackman"), ("bartlett", "bartlett"),
             ("boxcar", "boxcar"), ("blackman_harris", "blackmanharris"),
             ("nuttall", "nuttall"), ("flattop", "flattop")]
    for _ in range(10):
        ours, theirs = pairs[int(rng.integers(0, len(pairs)))]
        n = int(rng.integers(2, 3000))
        got = get_window_np(ours, n)
        want = sig.get_window(theirs, n, fftbins=False)
        err = np.abs(got - want).max()
        assert err < 1e-8, (ours, n, err)


def test_resample_linear_random_ratios_vs_reference_mirror(rng):
    """resample_linear vs a numpy mirror of src/resample/resampler.c:77-86
    at random L/M."""
    for _ in range(8):
        l = int(rng.integers(1, 12))
        m = int(rng.integers(1, 12))
        n = int(rng.integers(8, 3000))
        x = rng.standard_normal(n).astype(np.float32)
        out_n = (n - 1) * l // m + 1
        want = np.empty(out_n)
        for k in range(out_n):
            pos = min(max(k * m / l, 0.0), n - 1)
            i0 = int(np.floor(pos)); i1 = min(i0 + 1, n - 1)
            frac = pos - i0
            want[k] = x[i0] * (1 - frac) + x[i1] * frac
        got = np.asarray(vrs.resample_linear(jnp.asarray(x), l, m))
        assert got.shape == want.shape, (l, m, n)
        # f32 position arithmetic: ulp(pos) ~ 2.4e-4 at pos ~ 3000 times
        # the local slope — the device computes pos in f32 by design
        assert np.abs(got - want).max() < 2e-3, (l, m, n)


def test_integer_input_promotes_exactly(rng):
    """PCM integer buffers promote to f32 compute at every filtering op
    entry — previously filter weights were silently cast to int (all-zero
    taps, garbage output with no error)."""
    from vv_dsp_tpu.ops.stft import STFT
    from vv_dsp_tpu.models import NorthStarChain
    xi = (rng.standard_normal((2, 3000)) * 1000).astype(np.int32)
    xf = xi.astype(np.float32)
    h = vfir.design_lowpass_np(31, 0.4).astype(np.float32)
    cases = [
        lambda v: vfir.fir_apply(h, v),
        lambda v: vfir.fir_apply_mxu(h, v),
        lambda v: vfir.filtfilt_fir(h, v),
        lambda v: vrs.resample_poly(v, 4, 3),
        lambda v: vrs.fir_resample_fused(h, v, 4, 3),
        lambda v: vrs.upfirdn(h, v, 3, 2),
        lambda v: vrs.resample_linear(v, 4, 3),
        lambda v: vrs.resample_sinc(v, 4, 3),
        lambda v: vsg.savgol_filter(v, 11, 3),
        lambda v: STFT(256, 64).power(v),
        lambda v: NorthStarChain()(v),
    ]
    for i, fn in enumerate(cases):
        a = np.asarray(fn(jnp.asarray(xi)))
        b = np.asarray(fn(jnp.asarray(xf)))
        assert a.dtype == b.dtype, i
        np.testing.assert_array_equal(a, b, err_msg=f"case {i}")


def test_spectral_gate_random_geometries_bounded_and_identity(rng):
    """SpectralGate across random (nfft, hop) incl. non-divisible hops:
    threshold 0 must be identity over the FULL length (COLA edge padding),
    and gating a pure tone must never amplify past the input scale — the
    un-padded roundtrip amplified stream edges ~420x."""
    from vv_dsp_tpu.models import SpectralGate
    for _ in range(6):
        nfft = int(rng.choice([128, 256, 384, 512]))
        hop = int(rng.integers(nfft // 8, nfft // 2 + 1))  # any hop <= nfft/2
        n = int(rng.integers(4 * nfft, 20000))
        x = rng.standard_normal((2, n)).astype(np.float32)
        ident = np.asarray(SpectralGate(nfft=nfft, hop=hop, threshold=0.0)(
            jnp.asarray(x)))
        np.testing.assert_allclose(ident, x, rtol=5e-4, atol=5e-4,
                                   err_msg=f"{(nfft, hop, n)}")
        tone = (0.5 * np.sin(2 * np.pi * 0.01 * np.arange(n))
                ).astype(np.float32)[None]
        gated = np.asarray(SpectralGate(nfft=nfft, hop=hop, threshold=0.1)(
            jnp.asarray(tone)))
        assert np.abs(gated).max() <= 0.75, (nfft, hop, n,
                                             float(np.abs(gated).max()))


def test_streaming_chain_random_geometries_flush_parity(rng):
    """StreamingNorthStar across random (taps, up/down, nfft, hop, block
    count): streamed + flush must equal the offline chain on every frame
    (same oracle as test_streaming_chain_flush_completes_offline_parity,
    randomized)."""
    from vv_dsp_tpu.models import StreamingNorthStar
    from vv_dsp_tpu.ops import fir as _fir, mel as _mel
    from vv_dsp_tpu.ops.resample import resample_poly

    for _ in range(4):
        taps = int(rng.choice([16, 64, 129]))
        up, down = [(4, 3), (2, 1), (3, 2), (5, 4)][int(rng.integers(0, 4))]
        nfft = int(rng.choice([128, 256]))
        hop = nfft // int(rng.choice([2, 4]))
        chain = StreamingNorthStar(fir_taps=taps, up=up, down=down,
                                   nfft=nfft, hop=hop, n_mels=24, n_mfcc=10)
        block = down * hop * int(rng.integers(1, 4))
        while (block * up // down) % hop:
            block += down * hop
        nblocks = int(rng.integers(3, 7))
        x = jnp.asarray(rng.standard_normal((2, nblocks * block)),
                        dtype=jnp.float32)
        state = chain.init(x.shape[:-1])
        feats = []
        for i in range(nblocks):
            f, state = chain.process(state, x[..., i * block:(i + 1) * block])
            feats.append(f)
        feats.append(chain.flush(state))
        streamed = np.asarray(jnp.concatenate(feats, axis=-2))

        delay_in = chain._resampler._geometry[3]
        y = _fir.fir_apply(chain.fir_coeffs, x)
        y_lead = jnp.concatenate(
            [jnp.zeros(y.shape[:-1] + (delay_in,), y.dtype), y], axis=-1)
        y2 = resample_poly(y_lead, up, down)
        power = STFT(nfft, hop).power(y2)
        offline = np.asarray(_mel.mfcc(power, nfft, 24, 10,
                                       48000.0 * up / down))
        warm = nfft // hop - 1
        geo = (taps, up, down, nfft, hop, block, nblocks)
        assert streamed.shape[-2] == warm + offline.shape[-2], geo
        np.testing.assert_allclose(streamed[..., warm:, :], offline,
                                   rtol=2e-3, atol=2e-3, err_msg=str(geo))


def test_large_n_downstream_ops_on_matmul_tiers(rng):
    """Hilbert / cepstrum / CZT / DCT at sizes that ride the four-step (and
    large-dense) tiers, vs scipy/numpy oracles — the whole-signal ops VERDICT
    round 1 flagged as inheriting the large-N cliff must stay CORRECT now
    that they ride the fast tier."""
    import scipy.fft as sfft
    import scipy.signal as ssig
    from vv_dsp_tpu.ops import fft as vfft
    from vv_dsp_tpu.ops import czt as vczt
    from vv_dsp_tpu.ops import dct as vdct
    from vv_dsp_tpu.ops import envelope as venv
    from vv_dsp_tpu.ops import hilbert as vhil
    from vv_dsp_tpu.ops.complex_ops import cpx_from_device

    vfft.set_fft_backend("matmul")
    try:
        # sizes just above the 2048 dense cap: every op rides the four-step
        # tier here; bigger sizes hit the same code path but the CPU-mesh
        # CI budget (Bluestein pads CZT to next_pow2(N+M-1))
        for n in [6144, 10240]:
            x = rng.standard_normal(n).astype(np.float32)
            xj = jnp.asarray(x)

            want = ssig.hilbert(x.astype(np.float64))
            got = cpx_from_device(vhil.hilbert_analytic(xj))
            scale = np.abs(want).max()
            assert np.abs(got - want).max() / scale < 5e-5, n

            cep = np.asarray(venv.cepstrum_real(xj))
            spec = np.fft.rfft(x.astype(np.float64))
            want_cep = np.fft.irfft(np.log(np.abs(spec) + 1e-12), n)
            assert np.abs(cep - want_cep).max() < 5e-4, n

            # reference DCT-II convention = scipy's without the leading 2
            # (src/spectral/dct.c:21-30, see ops/dct.py docstring)
            want_dct = 0.5 * sfft.dct(x.astype(np.float64), type=2)
            got_dct = np.asarray(vdct.dct2_forward(xj))
            assert (np.abs(got_dct - want_dct).max()
                    / np.abs(want_dct).max()) < 5e-5, n

            m = n // 2
            w = np.exp(-2j * np.pi / m)  # scipy.signal.czt default spiral
            want_czt = ssig.czt(x.astype(np.float64), m)
            got_czt = cpx_from_device(vczt.czt(xj, m, w))
            assert (np.abs(got_czt - want_czt).max()
                    / np.abs(want_czt).max()) < 2e-4, n
    finally:
        vfft.set_fft_backend("auto")
