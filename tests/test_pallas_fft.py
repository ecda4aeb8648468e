"""Stockham-FFT Pallas kernels (interpret mode on CPU): the fused
STFT->mel kernel must match the XLA power-parts path and a float64 oracle;
the row->bin permutation must match np.fft exactly."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu.ops import mel as _mel
from vv_dsp_tpu.ops import pallas_fft as pf
from vv_dsp_tpu.ops.stft import STFT
from vv_dsp_tpu.ops.window import get_window_np


def _mel_ref_xla(x, nfft, hop, n_mels, sr, window="hann", fmin=0.0,
                 fmax=None, variant="htk"):
    plan = STFT(nfft, hop, window)
    re, im = plan.power_parts(x)
    return _mel.mel_energies_from_power_parts(re, im, nfft, n_mels, sr,
                                              fmin, fmax, variant)


def test_row_to_bin_perm_matches_npfft():
    """Butterflies-to-lstop + DFT-lstop with row p = lstop*b + k must hold
    bin k*(nfft//lstop) + bitrev(b): run the split pipeline in numpy."""
    n, lstop, B = 512, 64, 3
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, B)) + 1j * rng.standard_normal((n, B))
    s = x.copy()
    l = n
    while l > lstop:
        r, h = n // l, l // 2
        v = s.reshape(r, 2, h, B)
        a, b = v[:, 0], v[:, 1]
        w = np.exp(-2j * np.pi * np.arange(h) / l)[None, :, None]
        s = np.stack([a + b, (a - b) * w], axis=1).reshape(n, B)
        l //= 2
    d = np.exp(-2j * np.pi * np.outer(np.arange(lstop), np.arange(lstop))
               / lstop)
    out = np.zeros_like(s)
    for b in range(n // lstop):
        out[b * lstop:(b + 1) * lstop] = d @ s[b * lstop:(b + 1) * lstop]
    ref = np.fft.fft(x, axis=0)
    np.testing.assert_allclose(out, ref[pf.row_to_bin_perm(n, lstop)],
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("nfft,hop,win,n", [
    (256, 64, "hann", 4000),
    (512, 128, "hamming", 3000),
    (512, 512, "hann", 2100),     # hop == nfft (q == 1)
    (256, 64, "blackman", 100),   # n < nfft: single zero-padded frame
    (128, 32, "hann", 1000),      # smallest supported nfft
])
def test_stft_mel_pallas_matches_xla(rng, nfft, hop, win, n):
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    want = _mel_ref_xla(x, nfft, hop, 26, 16000.0, window=win)
    got = pf.stft_mel_energies_pallas(x, nfft, hop, 26, 16000.0, window=win)
    assert got.shape == want.shape
    scale = float(jnp.max(jnp.abs(want))) + 1e-30
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale,
                               rtol=0, atol=3e-6)


def test_stft_mel_pallas_vs_float64_oracle(rng):
    nfft, hop, n_mels, sr = 512, 128, 26, 16000.0
    x_np = rng.standard_normal((2, 4000)).astype(np.float32)
    w64 = get_window_np("hann", nfft, None)
    nf = 1 + (4000 - nfft + hop) // hop
    xp = np.pad(x_np, ((0, 0), (0, (nf - 1) * hop + nfft - 4000)))
    frames = np.stack([xp[:, f * hop:f * hop + nfft] for f in range(nf)],
                      axis=1).astype(np.float64)
    p64 = np.abs(np.fft.rfft(frames * w64, axis=-1)) ** 2
    fb64 = _mel.mel_filterbank_np(nfft, n_mels, sr, 0.0, sr / 2, "htk")
    ref = p64 @ fb64.T
    got = np.asarray(pf.stft_mel_energies_pallas(x_np, nfft, hop, n_mels, sr))
    assert (np.abs(got - ref) / np.abs(ref).max()).max() < 2e-6


def test_stft_mel_pallas_fmin_fmax_variant(rng):
    x = jnp.asarray(rng.standard_normal((1, 3000)).astype(np.float32))
    kw = dict(fmin=300.0, fmax=6000.0, variant="slaney")
    want = _mel_ref_xla(x, 256, 64, 20, 16000.0, **kw)
    got = pf.stft_mel_energies_pallas(x, 256, 64, 20, 16000.0, **kw)
    scale = float(jnp.max(jnp.abs(want))) + 1e-30
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, rtol=0, atol=3e-6)


def test_supported_gate():
    assert pf.stft_mel_supported(2048, 512)
    assert pf.stft_mel_supported(128, 8)
    assert not pf.stft_mel_supported(4096, 1024)   # VMEM cap
    assert not pf.stft_mel_supported(2048, 500)    # hop does not divide
    assert not pf.stft_mel_supported(1000, 250)    # not pow2
    assert not pf.stft_mel_supported(2048, 4)      # hop not sublane-aligned
    assert not pf.stft_mel_supported(64, 16)       # below min nfft


def test_mel_energies_stft_dispatch_fallback(rng):
    """Unsupported geometry must route to the XLA path with equal results."""
    x = jnp.asarray(rng.standard_normal((2, 3000)).astype(np.float32))
    got = _mel.mel_energies_stft(x, 250, 125, 20, 16000.0)  # non-pow2
    plan = STFT(250, 125, "hann")
    power = plan.power(x)
    fb = jnp.asarray(_mel.mel_filterbank_np(250, 20, 16000.0, 0.0, 8000.0,
                                            "htk"), dtype=power.dtype)
    want = jnp.einsum("...fb,mb->...fm", power, fb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_mfcc_stft_matches_power_parts_composition(rng):
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    nfft, hop, n_mels, n_mfcc, sr = 512, 128, 26, 13, 16000.0
    plan = STFT(nfft, hop, "hann")
    re, im = plan.power_parts(x)
    want = _mel.mfcc_from_power_parts(re, im, nfft, n_mels, n_mfcc, sr,
                                      lifter=22.0)
    got = _mel.mfcc_stft(x, nfft, hop, n_mels, n_mfcc, sr, lifter=22.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-4)


def _gate_ref(x_padded, nfft, hop, threshold, window="hann"):
    """Staged parts-path gate on the padded signal (SpectralGate body)."""
    plan = STFT(nfft, hop, window)
    re, im = plan.power_parts(x_padded)
    p2 = re * re + im * im
    peak2 = jnp.max(p2, axis=-1, keepdims=True)
    keep = p2 >= (threshold * threshold) * peak2
    zero = jnp.zeros_like(re)
    return plan.reconstruct_parts(jnp.where(keep, re, zero),
                                  jnp.where(keep, im, zero),
                                  x_padded.shape[-1])


@pytest.mark.parametrize("nfft,hop,n", [(256, 64, 4000), (512, 128, 3000),
                                        (1024, 256, 9000)])
def test_stft_gate_pallas_matches_staged(rng, nfft, hop, n):
    """Fused gate kernel vs the staged parts path: every retained sample
    (inside the COLA coverage pad) must match; the pad region is discarded
    by SpectralGate and is allowed to differ (periodic-norm edges)."""
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    pad = nfft - hop
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    want = np.asarray(_gate_ref(xp, nfft, hop, 0.1))[:, pad:pad + n]
    got = np.asarray(pf.stft_gate_pallas(xp, nfft, hop, 0.1))[:, pad:pad + n]
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=5e-6)


def test_stft_gate_pallas_pure_roundtrip(rng):
    """threshold=0 keeps every bin: the kernel is then a pure
    STFT->ISTFT roundtrip and must reproduce the padded input exactly on
    the retained range."""
    nfft, hop, n = 512, 128, 5000
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    pad = nfft - hop
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    got = np.asarray(pf.stft_gate_pallas(xp, nfft, hop, 0.0))[:, pad:pad + n]
    np.testing.assert_allclose(got, np.asarray(x), rtol=0, atol=2e-5)


@pytest.mark.parametrize("nfft,hop,n", [(256, 64, 4000), (512, 512, 2100),
                                        (256, 64, 100)])
def test_stft_power_stockham_matches_plan(rng, nfft, hop, n):
    """Natural-order power spectrogram from the Stockham kernel vs the
    plan's matmul path (unpermuting gather correctness incl. Nyquist)."""
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    re, im = plan.power_parts(x)
    want = np.asarray(re * re + im * im)
    got = np.asarray(pf.stft_power_stockham(x, nfft, hop))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=3e-6)


@pytest.mark.parametrize("onesided", [False, True])
def test_stft_spectrum_stockham_matches_plan(rng, onesided):
    """Natural-order complex spectra from the Stockham kernel vs the plan's
    matmul path, both two-sided and Hermitian-packed."""
    nfft, hop, n = 256, 64, 3000
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    want = np.asarray(plan.process(x, rfft=onesided))
    got = np.asarray(pf.stft_spectrum_stockham(x, nfft, hop,
                                               onesided=onesided))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=3e-6)


@pytest.mark.parametrize("rfft_flag,nfft,hop,n", [
    (True, 256, 64, 3000),
    (False, 256, 64, 3000),
    (True, 512, 128, 2100),
    (True, 512, 512, 2048),   # hop == nfft, no overlap
])
def test_istft_stockham_matches_reconstruct(rng, rfft_flag, nfft, hop, n):
    """Inverse kernel vs the plan's matmul reconstruct, including the
    partial-coverage edge norm (first/last nfft-hop samples)."""
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    spec = plan.process(x, rfft=rfft_flag)
    time = (jnp.fft.irfft(spec, nfft) if rfft_flag
            else jnp.fft.ifft(spec).real.astype(jnp.float32))
    want = np.asarray(plan._ola_norm(time.astype(jnp.float32), n))
    got = np.asarray(pf.istft_stockham(spec, nfft, hop, n, "hann",
                                       rfft=rfft_flag))
    scale = np.abs(want).max() + 1e-30
    # where the w^2 norm is tiny (partial-coverage edges; every hann frame
    # boundary when hop == nfft) the division amplifies f32 rounding
    # differences between the two computations arbitrarily — the
    # reference's own roundtrip contract there is 5e-2. Hold the strict
    # bound where coverage is full.
    e = nfft
    tight = 5e-6 if hop < nfft else 1e-2
    np.testing.assert_allclose(got[:, e:-e] / scale, want[:, e:-e] / scale,
                               rtol=0, atol=tight)
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=1e-2)


def test_istft_stockham_roundtrip_identity(rng):
    nfft, hop, n = 512, 128, 4000
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    spec = plan.process(x, rfft=True)
    got = np.asarray(pf.istft_stockham(spec, nfft, hop, n, rfft=True))
    # identity holds only where window coverage is full (the first/last
    # nfft-hop samples are not reconstructible: hann endpoints are zero)
    pad = nfft - hop
    np.testing.assert_allclose(got[:, pad:-pad], np.asarray(x)[:, pad:-pad],
                               rtol=0, atol=3e-5)


def test_stft_mfcc_pallas_full_fusion(rng):
    """One-kernel MFCC (log+DCT+lifter fused) vs the staged composition."""
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    nfft, hop, n_mels, n_mfcc, sr = 512, 128, 26, 13, 16000.0
    plan = STFT(nfft, hop, "hann")
    re, im = plan.power_parts(x)
    want = np.asarray(_mel.mfcc_from_power_parts(re, im, nfft, n_mels,
                                                 n_mfcc, sr, lifter=22.0))
    got = np.asarray(pf.stft_mfcc_pallas(x, nfft, hop, n_mels, n_mfcc, sr,
                                         lifter=22.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_supported_gate_rejects_extreme_hop():
    """q = nfft/hop > 128 would wrap the 256-lane OLA rolls (review
    finding): the gate must refuse so dispatch falls back to XLA."""
    assert not pf.stft_mel_supported(2048, 8)      # q = 256
    assert pf.stft_mel_supported(2048, 16)         # q = 128 is the cap


def test_kernel_vjp_machinery(rng):
    """kernel_with_xla_vjp: forward = interpret-mode kernel, backward =
    the XLA path's VJP — gradients must match the pure-XLA gradient
    exactly (the bwd IS that path) and the forward must stay the kernel's."""
    import jax
    from vv_dsp_tpu.utils.kernel_grad import kernel_with_xla_vjp

    nfft, hop, n_mels, sr = 256, 64, 20, 16000.0
    x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
    fast = lambda v: pf.stft_mel_energies_pallas(v, nfft, hop, n_mels, sr,
                                                 interpret=True)
    ref = lambda v: _mel_ref_xla(v, nfft, hop, n_mels, sr)
    f = kernel_with_xla_vjp(fast, ref)
    got_fwd = np.asarray(f(x))
    np.testing.assert_allclose(got_fwd, np.asarray(fast(x)), rtol=0, atol=0)
    g = jax.grad(lambda v: jnp.sum(f(v)))(x)
    g_ref = jax.grad(lambda v: jnp.sum(ref(v)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=0, atol=0)


@pytest.mark.parametrize("nfft,hop", [(2048, 512), (1024, 256), (256, 16),
                                      (4096, 1024), (512, 512)])
def test_stft_spectrum_packed_matches_oracle(rng, nfft, hop):
    """Packed-real spectrum kernel (m = nfft/2 complex FFT + paired-row
    Hermitian unpack incl. the Nyquist row) vs a float64 framed-FFT
    oracle, two-sided and one-sided."""
    from vv_dsp_tpu.ops.window import get_window_np

    n = nfft * 4 + hop * 3
    x = jnp.asarray(rng.standard_normal((2, n)), dtype=jnp.float32)
    got = np.asarray(pf.stft_spectrum_packed(x, nfft, hop, interpret=True))
    w = get_window_np("hann", nfft, None)
    nf = 1 + (n - nfft + hop) // hop
    xp = np.pad(np.asarray(x, np.float64),
                ((0, 0), (0, (nf - 1) * hop + nfft - n)))
    frames = np.stack([xp[:, i * hop:i * hop + nfft] for i in range(nf)], 1)
    want = np.fft.fft(frames * w, axis=-1)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-5
    g1 = np.asarray(pf.stft_spectrum_packed(x, nfft, hop, onesided=True,
                                            interpret=True))
    assert np.abs(g1 - want[..., : nfft // 2 + 1]).max() / scale < 5e-5


@pytest.mark.parametrize("nfft,hop", [(2048, 512), (512, 128)])
def test_stft_power_packed_matches_oracle(rng, nfft, hop):
    from vv_dsp_tpu.ops.window import get_window_np

    n = nfft * 4 + hop * 3
    x = jnp.asarray(rng.standard_normal((2, n)), dtype=jnp.float32)
    got = np.asarray(pf.stft_power_packed(x, nfft, hop, interpret=True))
    w = get_window_np("hann", nfft, None)
    nf = 1 + (n - nfft + hop) // hop
    xp = np.pad(np.asarray(x, np.float64),
                ((0, 0), (0, (nf - 1) * hop + nfft - n)))
    frames = np.stack([xp[:, i * hop:i * hop + nfft] for i in range(nf)], 1)
    want = np.abs(np.fft.rfft(frames * w, axis=-1)) ** 2
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-5


@pytest.mark.parametrize("rfft_flag", [True, False])
@pytest.mark.parametrize("nfft,hop,n", [(2048, 512, 10240), (1024, 256, 6000),
                                        (512, 128, 4000)])
def test_istft_packed_matches_reconstruct(rng, rfft_flag, nfft, hop, n):
    """Packed-real inverse kernel (m = nfft/2 complex inverse of the
    Hermitian-repacked spectrum) vs the plan's matmul reconstruct; edge
    tolerance as in test_istft_stockham_matches_reconstruct (tiny-w^2
    division amplifies f32 rounding differences arbitrarily there)."""
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    spec = plan.process(x, rfft=rfft_flag)
    time = (jnp.fft.irfft(spec, nfft) if rfft_flag
            else jnp.fft.ifft(spec).real.astype(jnp.float32))
    want = np.asarray(plan._ola_norm(time.astype(jnp.float32), n))
    got = np.asarray(pf.istft_packed(spec, nfft, hop, n, "hann",
                                     rfft=rfft_flag, interpret=True))
    scale = np.abs(want).max() + 1e-30
    e = nfft
    np.testing.assert_allclose(got[:, e:-e] / scale, want[:, e:-e] / scale,
                               rtol=0, atol=5e-6)


def test_istft_packed_roundtrip_identity(rng):
    nfft, hop, n = 512, 128, 4000
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    plan = STFT(nfft, hop, "hann")
    spec = plan.process(x, rfft=True)
    got = np.asarray(pf.istft_packed(spec, nfft, hop, n, rfft=True,
                                     interpret=True))
    pad = nfft - hop
    np.testing.assert_allclose(got[:, pad:-pad], np.asarray(x)[:, pad:-pad],
                               rtol=0, atol=3e-5)


@pytest.mark.parametrize("nfft,hop", [(1024, 256), (2048, 512), (512, 128)])
def test_stft_gate_packed_matches_plain(rng, nfft, hop):
    """Packed-real fused gate kernel vs the plain Stockham gate kernel on
    COLA-padded input (interior samples exact — the models.SpectralGate
    contract)."""
    n = nfft * 4
    pad = nfft - hop
    x = np.zeros((2, n + 2 * pad), np.float32)
    x[:, pad:pad + n] = rng.standard_normal((2, n)).astype(np.float32)
    xj = jnp.asarray(x)
    a = np.asarray(pf.stft_gate_pallas(xj, nfft, hop, 0.1, interpret=True))
    b = np.asarray(pf.stft_gate_packed(xj, nfft, hop, 0.1, interpret=True))
    scale = max(1.0, np.abs(a).max())
    assert np.abs(a[:, pad:pad + n] - b[:, pad:pad + n]).max() / scale < 5e-6


@pytest.mark.parametrize("nf_target,tk_expect", [(640, 640), (772, 640)])
def test_stft_mel_wide_tiles_match_xla(rng, nf_target, tk_expect):
    """Long signals select the wide tk=640 frame tile (the round-4
    addition to _pick_tk; 768 was withdrawn — it OOMs Mosaic scoped VMEM
    in some compile contexts, see pallas_fft's VMEM notes); the kernel
    output must be tile-width invariant. nfft=256/hop=64 keeps
    interpret-mode cost low while the frame count forces the wide pick."""
    nfft, hop, n_mels = 256, 64, 24
    n = (nf_target - 1) * hop + nfft
    tk = pf._packed_mel_pick_tk(nf_target, nfft // 2, hop)
    assert tk == tk_expect, tk
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    got = np.asarray(pf.stft_mel_energies_pallas(x, nfft, hop, n_mels,
                                                 16000.0, interpret=True))
    ref = np.asarray(_mel_ref_xla(x, nfft, hop, n_mels, 16000.0))
    scale = max(1.0, np.abs(ref).max())
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / scale < 5e-6


@pytest.mark.parametrize("nfft,hop", [(1024, 256), (256, 64),
                                      (512, 128), (2048, 1024)])
def test_gate_split_matches_fused(rng, nfft, hop):
    """The split spectrum->masked-inverse pair (round 5, the SpectralGate
    fast path) must reproduce the fused gate kernel on every retained
    sample."""
    n = nfft * 4
    pad = nfft - hop
    x = np.zeros((2, n + 2 * pad), np.float32)
    x[:, pad:pad + n] = rng.standard_normal((2, n)).astype(np.float32)
    xj = jnp.asarray(x)
    a = np.asarray(pf.stft_gate_packed(xj, nfft, hop, 0.1, interpret=True))
    b = np.asarray(pf.stft_gate_split(xj, nfft, hop, 0.1, interpret=True))
    scale = max(1.0, np.abs(a).max())
    assert np.abs(a[:, pad:pad + n] - b[:, pad:pad + n]).max() / scale < 5e-6


def test_packed_spectrum_roundtrip_and_interop(rng):
    """PackedSpectrum (round 5): zero-copy process->reconstruct matches the
    XLA reference path; to_natural() matches process(); apply_mask with a
    half-band mask matches masking the natural spectrum."""
    from vv_dsp_tpu.ops import fft as _fft

    nfft, hop, nf = 512, 128, 40
    n = (nf - 1) * hop + nfft
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    plan = STFT(nfft, hop)
    ps = pf.stft_spectrum_packed_raw(x, nfft, hop, interpret=True)

    spec = plan._process_xla(x, True)
    nat = np.asarray(ps.to_natural())
    scale = max(1.0, float(jnp.abs(spec).max()))
    assert np.abs(nat - np.asarray(spec)).max() / scale < 5e-6

    ref = np.asarray(plan._ola_norm(_fft.irfft(spec, nfft), n))
    got = np.asarray(pf.istft_packed_from_storage(ps, n, interpret=True))
    lo, hi = nfft, n - nfft
    assert np.abs(got[:, lo:hi] - ref[:, lo:hi]).max() / max(
        1.0, np.abs(ref).max()) < 5e-6

    mask = np.zeros(nfft // 2 + 1, np.float32)
    mask[: nfft // 8] = 1.0
    got_m = np.asarray(pf.istft_packed_from_storage(
        ps.apply_mask(mask), n, interpret=True))
    ref_m = np.asarray(plan._ola_norm(
        _fft.irfft(spec * jnp.asarray(mask), nfft), n))
    assert np.abs(got_m[:, lo:hi] - ref_m[:, lo:hi]).max() / max(
        1.0, np.abs(ref_m).max()) < 5e-6

    rows = ps.bin_to_row()
    assert rows.shape == (nfft // 2 + 1,)
    assert sorted(rows.tolist()) == sorted(set(rows.tolist()))


def test_istft_packed_every_supported_geometry(rng):
    """Pre-norm reconstruction parity across the ENTIRE packed-inverse
    geometry lattice (every pow2 nfft in [256, 4096] x every 16-aligned
    dividing hop with q <= 128): the OLA strip/spill/epilogue arithmetic
    must be exact for every (q, tk, steps) shape — the round-5 restructure
    touched all of it.  Pre-norm comparison sidesteps the 1/w^2 guard
    amplification at window edges (identical in both paths)."""
    from vv_dsp_tpu.ops import fft as _fft

    checked = 0
    for nfft in (256, 512, 1024, 2048, 4096):
        for hop in (16, 32, 64, 128, 256, 512, 1024, 2048):
            if hop >= nfft or nfft % hop or nfft // hop > 128:
                continue
            nf = 7
            n = (nf - 1) * hop + nfft
            x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            plan = STFT(nfft, hop)
            spec = plan.process(x, rfft=True)
            ref = plan._ola_norm(_fft.irfft(spec, nfft), n)
            got = pf.istft_packed(spec, nfft, hop, n, rfft=True,
                                  interpret=True)
            norm = pf._ola_norm_table(nfft, hop, nf, n, "hann", None)
            d = np.abs(np.asarray((got - ref)) * norm).max()
            scale = max(1.0, float(jnp.abs(x).max()) * nfft)
            assert d / scale < 5e-6, (nfft, hop, d)
            checked += 1
    assert checked >= 20, checked
