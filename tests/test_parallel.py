"""Sharded-op parity: every vv_dsp_tpu.parallel operator must reproduce its
single-device vv_dsp_tpu.ops counterpart bit-for-tolerance on an 8-virtual-
device CPU mesh — the seam-correctness contract (SURVEY.md section 2.12).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vv_dsp_tpu.ops import fir, iir, resample
from vv_dsp_tpu.ops.stft import STFT
from vv_dsp_tpu import parallel
from vv_dsp_tpu.parallel import mesh as pmesh


MESH_SHAPES = [(1, 8), (2, 4), (4, 2), (8, 1)]


def make_mesh(shape):
    return pmesh.make_mesh(shape[0], shape[1])


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32)


@pytest.mark.parametrize("shape", MESH_SHAPES)
@pytest.mark.parametrize("taps", [1, 9, 64, 257])
def test_fir_sharded_matches_dense(sig, shape, taps):
    mesh = make_mesh(shape)
    h = fir.design_lowpass(taps, 0.25) if taps > 1 else jnp.ones((1,))
    want = fir.fir_apply(h, sig)
    got = parallel.fir_apply_sharded(h, sig, mesh)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_fir_sharded_fft_path(sig, shape):
    mesh = make_mesh(shape)
    h = fir.design_lowpass(301, 0.1)
    want = fir.fir_apply(h, sig)
    got = parallel.fir_apply_sharded(h, sig, mesh, use_fft=True)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("shape", MESH_SHAPES)
def test_iir_sharded_matches_dense(sig, shape):
    mesh = make_mesh(shape)
    sos = iir.butter_sos(4, 0.2)
    want = iir.iir_apply(sos, sig)
    got = parallel.iir_apply_sharded(sos, sig, mesh)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_iir_sharded_matches_scipy(sig):
    scipy_signal = pytest.importorskip("scipy.signal")
    mesh = make_mesh((2, 4))
    sos = iir.butter_sos(4, 0.2)
    want = scipy_signal.sosfilt(np.asarray(sos, dtype=np.float64),
                                np.asarray(sig, dtype=np.float64))
    got = parallel.iir_apply_sharded(sos, sig, mesh)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (8, 1)])
@pytest.mark.parametrize("nfft,hop", [(256, 64), (1024, 256), (512, 512)])
def test_stft_sharded_matches_dense(sig, shape, nfft, hop):
    mesh = make_mesh(shape)
    plan = STFT(nfft, hop)
    want = plan.process(sig, rfft=True)
    got = parallel.stft_process_sharded(sig, nfft, hop, mesh)
    # The sharded op emits n//hop frames; the reference count
    # 1 + (n-nfft+hop)//hop can exceed that by one fully-zero-padded frame
    # when nfft == hop — those extra frames are identically zero.
    nf = min(want.shape[-2], got.shape[-2])
    np.testing.assert_allclose(got[..., :nf, :], want[..., :nf, :],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(want[..., nf:, :], 0.0, atol=1e-6)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_stft_roundtrip_sharded(sig, shape):
    mesh = make_mesh(shape)
    nfft, hop = 512, 128
    spec = parallel.stft_process_sharded(sig, nfft, hop, mesh)
    out = parallel.stft_reconstruct_sharded(spec, nfft, hop, mesh)
    n = sig.shape[-1]
    # Fully-overlapped samples reconstruct the signal exactly; the first and
    # last nfft samples are the usual OLA warm-up/tail edges (Hann ~ 0 at the
    # frame ends), same as the dense path.
    np.testing.assert_allclose(out[..., nfft : n - nfft],
                               sig[..., nfft : n - nfft],
                               rtol=5e-4, atol=5e-4)
    # And the sharded roundtrip equals the dense roundtrip EVERYWHERE,
    # including both edges — the seam-stitching contract.
    dense = STFT(nfft, hop).reconstruct(spec, n, rfft=True)
    np.testing.assert_allclose(out, dense, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (8, 1)])
@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (4, 3), (3, 4), (160, 147)])
def test_resample_poly_sharded_matches_dense(sig, shape, up, down):
    mesh = make_mesh(shape)
    n = sig.shape[-1]
    # trim so n divides nb*down
    nb = shape[1]
    n2 = (n // (nb * down)) * nb * down
    x = sig[..., :n2]
    want = resample.resample_poly(x, up, down)
    got = parallel.resample_poly_sharded(x, up, down, mesh)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_channel_sharded_ops_run(sig):
    mesh = make_mesh((8, 1))
    xs = parallel.shard_channels(jnp.tile(sig, (2, 1)), mesh)
    h = fir.design_lowpass(33, 0.3)
    y = jax.jit(lambda v: fir.fir_apply(h, v))(xs)
    np.testing.assert_allclose(y[:8], fir.fir_apply(h, sig), rtol=1e-5,
                               atol=1e-5)


def test_pad_to_blocks():
    mesh = make_mesh((1, 8))
    x = jnp.ones((2, 100))
    xp, n = pmesh.pad_to_blocks(x, mesh)
    assert xp.shape[-1] == 104 and n == 100
    np.testing.assert_array_equal(np.asarray(xp[..., 100:]), 0.0)


# ---------------------------------------------------------------------------
# distributed FFT (four-step) + sharded Hilbert
# ---------------------------------------------------------------------------

from vv_dsp_tpu.parallel import fft as pfft
from vv_dsp_tpu.ops import hilbert as _hilbert


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_fft_sharded_matches_dense(rng, shape):
    mesh = make_mesh(shape)
    nb = shape[1]
    x = jnp.asarray(rng.standard_normal((8, 1024)), dtype=jnp.float32)
    spec = pfft.fft_sharded(x, mesh)
    # cyclic layout: element at shard k1, local k2 = X[k1 + nb*k2]
    want = np.fft.fft(np.asarray(x, dtype=np.float64))
    got = np.asarray(spec)
    n = x.shape[-1]
    t_local = n // nb
    reorder = np.empty(n, dtype=np.int64)
    for k1 in range(nb):
        reorder[k1 * t_local : (k1 + 1) * t_local] = k1 + nb * np.arange(t_local)
    np.testing.assert_allclose(got, want[..., reorder], rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_fft_sharded_roundtrip(rng, shape):
    mesh = make_mesh(shape)
    x = jnp.asarray(rng.standard_normal((8, 2048)), dtype=jnp.float32)
    spec = pfft.fft_sharded(x, mesh)
    back = pfft.ifft_sharded(spec, mesh)
    np.testing.assert_allclose(np.asarray(jnp.real(back)), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.imag(back)), 0.0, atol=1e-4)


def test_hilbert_sharded_matches_dense(rng):
    mesh = make_mesh((2, 4))
    x = jnp.asarray(rng.standard_normal((8, 4096)), dtype=jnp.float32)
    want = _hilbert.hilbert_analytic(x)
    got = pfft.hilbert_analytic_sharded(x, mesh)
    np.testing.assert_allclose(np.asarray(jnp.real(got)),
                               np.asarray(jnp.real(want)), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.imag(got)),
                               np.asarray(jnp.imag(want)), rtol=1e-3,
                               atol=1e-3)


def test_cepstrum_sharded_matches_dense(rng):
    from vv_dsp_tpu.ops import envelope as _env
    mesh = make_mesh((2, 4))
    x = jnp.asarray(rng.standard_normal((8, 2048)) + 2.0, dtype=jnp.float32)
    want = _env.cepstrum_real(x)
    got = pfft.cepstrum_real_sharded(x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=1e-3)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_savgol_sharded_matches_dense(sig, shape):
    from vv_dsp_tpu.ops import savgol as _savgol
    mesh = make_mesh(shape)
    want = _savgol.savgol_filter(sig, 21, 3)
    got = parallel.ops.savgol_filter_sharded(sig, 21, 3, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_filtfilt_sharded_matches_dense(sig, shape):
    mesh = make_mesh(shape)
    h = fir.design_lowpass(33, 0.25)
    want = fir.filtfilt_fir(h, sig)
    got = parallel.ops.filtfilt_fir_sharded(h, sig, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4,
                               atol=5e-4)


def test_fft_sharded_long_signal(rng):
    """Twiddle phases must stay accurate for long signals (regression:
    unreduced f32 phase products went garbage past ~1M samples)."""
    mesh = make_mesh((1, 8))
    n = 1 << 21  # 2M
    t = np.arange(n)
    x = jnp.asarray(np.sin(2 * np.pi * 12345.0 * t / n)[None, :].repeat(8, 0),
                    dtype=jnp.float32)
    spec = pfft.fft_sharded(x, mesh)
    back = pfft.ifft_sharded(spec, mesh)
    np.testing.assert_allclose(np.asarray(jnp.real(back[0])),
                               np.asarray(x[0]), atol=2e-3)
    # the tone lands in exactly two bins: check via the cyclic layout
    mags = np.abs(np.asarray(jnp.stack([jnp.real(spec), jnp.imag(spec)]))
                  ).max()
    assert mags > n / 4  # peak magnitude ~ n/2


def test_filtfilt_sharded_wide_halo(sig):
    """halo (taps-1) wider than the per-shard block: multi-block ppermute
    rounds + global-edge gather fix-up (round-1 refusal lifted)."""
    mesh = make_mesh((1, 8))
    h = fir.design_lowpass(1025, 0.25)  # pad 1024 > 4096/8 = 512
    want = fir.filtfilt_fir(h, sig)
    got = parallel.ops.filtfilt_fir_sharded(h, sig, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4,
                               atol=5e-4)


def test_savgol_sharded_wide_halo(sig):
    from vv_dsp_tpu.ops import savgol
    mesh = make_mesh((1, 8))
    wl = 257  # half 128 > 64 per-shard block (reference caps wl at 257)
    x = sig[..., :512]
    want = savgol.savgol_filter(x, wl, 3)
    got = parallel.ops.savgol_filter_sharded(x, wl, 3, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=1e-3)


def test_sharded_edge_validation(sig):
    mesh = make_mesh((1, 8))
    with pytest.raises(ValueError):  # window longer than the whole signal
        parallel.ops.savgol_filter_sharded(sig, 2 * 4096 + 1, 3, mesh)


@pytest.mark.parametrize("nfft,hop", [(512, 160), (384, 96)])
def test_stft_sharded_nondivisible_hop(sig, nfft, hop):
    """nfft % hop != 0 (512/160) and pad=True for ragged lengths
    (round-1 refusals lifted; reference stft.c:33 allows any hop <= nfft)."""
    mesh = make_mesh((1, 8))
    x = sig[..., : (sig.shape[-1] // (8 * hop)) * (8 * hop)]
    plan = STFT(nfft, hop)
    want = plan.process(x, rfft=True)
    got = parallel.stft_process_sharded(x, nfft, hop, mesh)
    nf = min(want.shape[-2], got.shape[-2])
    np.testing.assert_allclose(got[..., :nf, :], want[..., :nf, :],
                               rtol=1e-4, atol=1e-4)
    # roundtrip through the scatter OLA path
    out = parallel.stft_reconstruct_sharded(got, nfft, hop, mesh)
    n = x.shape[-1]
    np.testing.assert_allclose(out[..., nfft : n - nfft],
                               x[..., nfft : n - nfft], rtol=5e-4, atol=5e-4)


def test_stft_sharded_pad_ragged_length(sig):
    mesh = make_mesh((1, 8))
    nfft, hop = 256, 64
    x = sig[..., : 4096 - 100]  # not a multiple of nb*hop
    with pytest.raises(ValueError):
        parallel.stft_process_sharded(x, nfft, hop, mesh)
    got = parallel.stft_process_sharded(x, nfft, hop, mesh, pad=True)
    n_pad = 4096  # next multiple of 8*64
    want = STFT(nfft, hop).process(
        jnp.pad(x, [(0, 0), (0, n_pad - x.shape[-1])]), rfft=True)
    nf = min(want.shape[-2], got.shape[-2])
    np.testing.assert_allclose(got[..., :nf, :], want[..., :nf, :],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_northstar_flagship_geometry_sharded(rng, shape):
    """The FLAGSHIP chain at its real geometry (1024-tap FIR, 4/3 polyphase,
    2048-pt STFT / 512 hop, 80 mels, 20 MFCCs) run sharded on the 8-device
    mesh vs the single-device chain — covers halo-larger-than-typical-block
    interactions the shrunken-dryrun geometry (64 taps / 256 nfft) misses."""
    from vv_dsp_tpu.models import NorthStarChain

    chain = NorthStarChain()
    n = 8 * 2048 * 3  # divisible by every block/hop/ratio constraint
    x = jnp.asarray(rng.standard_normal((2, n)), dtype=jnp.float32)
    mesh = make_mesh(shape)
    want = chain(x)
    got = chain.apply_sharded(x, mesh)
    # the sharded STFT covers whole blocks, so it may emit a couple of extra
    # zero-padded tail frames beyond the dense spectrogram's frame count
    nf = want.shape[-2]
    assert got.shape[-2] >= nf and got.shape[::2] == want.shape[::2]
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(got[..., :nf, :], want, rtol=0,
                               atol=2e-3 * scale)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_northstar_fused_halos_match_staged(rng, shape):
    """fuse_halos=True (one combined left+right raw-signal exchange, 2
    ppermute rounds) must reproduce the staged 4-exchange path: the deep
    halo covers the composed FIR->polyphase->STFT dependency cone and the
    boundary recompute is bit-compatible (same local kernels)."""
    from vv_dsp_tpu.models import NorthStarChain

    chain = NorthStarChain()
    n = 8 * 2048 * 3
    x = jnp.asarray(rng.standard_normal((2, n)), dtype=jnp.float32)
    mesh = make_mesh(shape)
    staged = chain.apply_sharded(x, mesh, fuse_halos=False)
    fused = chain.apply_sharded(x, mesh, fuse_halos=True)
    assert staged.shape == fused.shape
    scale = float(jnp.abs(staged).max())
    np.testing.assert_allclose(np.asarray(fused), np.asarray(staged),
                               rtol=0, atol=2e-4 * scale)


def test_savgol_sharded_halo_equals_block(sig):
    """halo == per-shard block in 'reflect' mode: reflecting position -t
    needs x[t] from the NEIGHBOR shard, so this must route to the gather
    path (the fast path's slice is one element short there)."""
    from vv_dsp_tpu.ops import savgol
    mesh = make_mesh((1, 8))
    x = sig[..., :1024]  # t = 128 per shard
    wl = 257             # half = 128 == t
    want = savgol.savgol_filter(x, wl, 3)
    got = parallel.ops.savgol_filter_sharded(x, wl, 3, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=1e-3)
