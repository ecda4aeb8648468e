"""Hardware-compiled kernel checks — the Mosaic/real-TPU counterpart of the
interpret-mode suites.

Everything else in tests/ exercises the Pallas kernels through the HLO
interpreter on CPU (fast, deterministic, no chip needed). This module
compiles them through Mosaic on an actual TPU and checks the SAME oracles,
catching what interpret mode cannot: layout/relayout bugs, dot-algorithm
(bf16x3) numerics on the real MXU, DMA/semaphore behavior, and the
TPU-only dispatch gates (tiled handoff) that CPU runs never take.

Run standalone (the CPU-forced conftest is bypassed by the env knob):

    VV_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Skipped entirely when the backend is not a TPU, so the default CPU suite
is unaffected.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU (run with VV_TPU_TESTS=1)")


@pytest.fixture
def rng():
    return np.random.default_rng(99)


def test_packed_mel_kernel_mosaic_vs_xla(rng):
    """Packed-real fused STFT->mel kernel, Mosaic-compiled, vs the XLA
    power-parts composition (f32 dots both sides). The signal is long
    enough (nf >= 641) that the WIDE tk=640 tile pick — the packed mel
    cap — is selected; its VMEM footprint sits closer to the ceiling
    than any other mel geometry, so this doubles as the compile guard
    for it (tk=768 was withdrawn: 19.1 MB scoped VMEM OOM standalone)."""
    from vv_dsp_tpu.ops import mel as _mel
    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.stft import STFT

    nfft, hop, n_mels, sr = 2048, 512, 80, 48000.0
    x = jnp.asarray(rng.standard_normal((4, 400000)), dtype=jnp.float32)
    got = np.asarray(pf.stft_mel_energies_pallas(
        x, nfft, hop, n_mels, sr, interpret=False, algorithm="f32"))
    plan = STFT(nfft, hop)
    re, im = plan.power_parts(x)
    ref = np.asarray(_mel.mel_energies_from_power_parts(
        re, im, nfft, n_mels, sr))
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 5e-6


def test_banded_head_bf16x3_vs_float64_oracle(rng):
    """Fused FIR+resample banded kernel at the flagship geometry under the
    default bf16x3 dot tier vs a float64 numpy upfirdn oracle — the real
    MXU's error-compensated bf16 numerics must stay well inside the 5e-5
    north-star contract (measured class: ~8e-6)."""
    import math
    from vv_dsp_tpu.ops import fir as _fir
    from vv_dsp_tpu.ops.resample import (_fused_fir_resample_filter,
                                         fir_resample_fused)

    up, down, n = 4, 3, 48000
    h = _fir.design_lowpass_np(1024, 0.45)
    x = rng.standard_normal((2, n)).astype(np.float32)
    got = np.asarray(fir_resample_fused(h, jnp.asarray(x), up, down,
                                        algorithm="bf16x3"))

    g, offset = _fused_fir_resample_filter(tuple(h.astype(np.float64)), up,
                                           down)
    n_out = -(-n * up // down)
    xf = x.astype(np.float64)
    up_x = np.zeros((2, n * up), np.float64)
    up_x[:, ::up] = xf
    full = np.stack([np.convolve(up_x[c], g / 1.0) for c in range(2)])
    # fused op semantics: output k = full[offset + k*down] for k < m0; the
    # outputs [m0, n_out) see the staged FIR's end-of-signal truncation and
    # are recomputed staged in-op (covered by the CPU parity tests) — the
    # pure-composite oracle only applies to the interior
    ref = full[:, offset:offset + n_out * down:down]
    m0 = max(0, -(-(up * n - offset) // down))
    scale = np.abs(ref).max()
    rel = np.abs(got[:, :m0] - ref[:, :m0]).max() / scale
    assert got.shape[1] == n_out
    assert m0 > n_out - 1024
    assert rel < 5e-5, rel


def test_tiled_handoff_chain_bitexact_vs_staged(rng):
    """The zero-copy tiled handoff (banded head segments fed straight into
    the packed STFT kernel, tk=640 at this geometry) must be BIT-exact vs
    the staged composite — both Mosaic-compiled."""
    from vv_dsp_tpu.models import NorthStarChain
    from vv_dsp_tpu.ops import mel as _mel
    from vv_dsp_tpu.ops.resample import fir_resample_fused

    chain = NorthStarChain()
    x = jnp.asarray(rng.standard_normal((2, 479232)), dtype=jnp.float32)
    assert chain._tiled_handoff_ok(x.shape[-1])
    fast = jax.jit(chain)(x)

    def staged(xv):
        y = fir_resample_fused(chain.fir_coeffs, xv, chain.up, chain.down,
                               algorithm=chain.head_algorithm)
        return _mel.mfcc_stft(y, chain.nfft, chain.hop, chain.n_mels,
                              chain.n_mfcc,
                              chain.sample_rate * chain.up / chain.down,
                              window=chain.window,
                              algorithm=chain.stft_algorithm)

    ref = jax.jit(staged)(x)
    assert float(jnp.max(jnp.abs(fast - ref))) == 0.0


def test_gate_packed_mosaic_roundtrip_identity(rng):
    """Packed fused gate kernel with threshold 0 (keep everything) is the
    identity on COLA-padded interior samples — on hardware."""
    from vv_dsp_tpu.ops import pallas_fft as pf

    nfft, hop = 1024, 256
    n = 48000
    pad = nfft - hop
    x = np.zeros((2, n + 2 * pad), np.float32)
    x[:, pad:pad + n] = rng.standard_normal((2, n)).astype(np.float32)
    got = np.asarray(pf.stft_gate_packed(jnp.asarray(x), nfft, hop, 0.0,
                                         interpret=False))
    np.testing.assert_allclose(got[:, pad:pad + n], x[:, pad:pad + n],
                               rtol=0, atol=3e-5)


def test_spectrum_packed_mosaic_vs_npfft(rng):
    """Packed spectrum kernel (full c2c, gather-free natural-order
    epilogue) vs np.fft on hardware."""
    from vv_dsp_tpu.ops import pallas_fft as pf

    nfft, hop = 1024, 256
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    got = np.asarray(jnp.stack([
        jnp.real(s := pf.stft_spectrum_packed(jnp.asarray(x), nfft, hop,
                                              interpret=False)),
        jnp.imag(s)]))
    from vv_dsp_tpu.ops.window import get_window_np
    w = get_window_np("hann", nfft, None)
    nf = 1 + (x.shape[1] - nfft + hop) // hop
    xp = np.pad(x, ((0, 0), (0, (nf - 1) * hop + nfft - x.shape[1])))
    frames = np.stack([xp[:, f * hop:f * hop + nfft] * w for f in range(nf)],
                      axis=1)
    ref = np.fft.fft(frames.astype(np.float64), axis=-1)
    scale = np.abs(ref).max()
    err = max(np.abs(got[0] - ref.real).max(), np.abs(got[1] - ref.imag).max())
    assert err / scale < 5e-6


@pytest.mark.parametrize("nfft,hop", [
    (2048, 256), (2048, 512), (2048, 1024),
    (4096, 512), (4096, 1024), (4096, 2048),
])
def test_spectrum_budget_sweep_compiles_and_matches(rng, nfft, hop):
    """VMEM-ceiling guard for the spectrum/power tile picks: within ~1 MB
    of the 16 MB ceiling Mosaic compile success is non-deterministic
    across geometries (full-tile butterfly stack temporaries the byte
    model can't see — a 15 MB budget measured -24% at 2048/512 but OOMed
    other geometries with identical per-tile buffers; see the note above
    _pick_tk's spectrum call sites). The signal is LONG (nf > 600) so
    the actual production tk is selected — short signals cap tk at 128
    and would validate nothing. Every pick must COMPILE on hardware and
    match a float64 np.fft oracle."""
    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.window import get_window_np

    n = 620 * hop + nfft
    x = rng.standard_normal((2, n)).astype(np.float32)
    got = pf.stft_spectrum_packed(jnp.asarray(x), nfft, hop, onesided=True,
                                  interpret=False)
    gre, gim = np.asarray(jnp.real(got)), np.asarray(jnp.imag(got))
    w = get_window_np("hann", nfft, None)
    nf = 1 + (n - nfft + hop) // hop
    xp = np.pad(x, ((0, 0), (0, (nf - 1) * hop + nfft - n)))
    frames = np.stack([xp[:, f * hop:f * hop + nfft] * w for f in range(nf)],
                      axis=1)
    ref = np.fft.rfft(frames.astype(np.float64), axis=-1)
    scale = np.abs(ref).max()
    err = max(np.abs(gre - ref.real).max(), np.abs(gim - ref.imag).max())
    assert err / scale < 5e-6
    # and the power kernel at the same geometry
    pw = np.asarray(pf.stft_power_packed(jnp.asarray(x), nfft, hop,
                                         interpret=False))
    perr = np.abs(pw - np.abs(ref) ** 2).max() / (scale * scale)
    assert perr < 5e-6


def test_istft_packed_mosaic_roundtrip(rng):
    """process -> reconstruct through the packed forward and inverse
    kernels on hardware: the w^2-normalized OLA roundtrip must reproduce
    fully-covered samples."""
    from vv_dsp_tpu.ops.stft import STFT

    nfft, hop, n = 1024, 256, 120000
    x = rng.standard_normal((2, n)).astype(np.float32)
    plan = STFT(nfft, hop)
    spec = plan.process(jnp.asarray(x), rfft=True)
    got = np.asarray(plan.reconstruct(spec, n, rfft=True))
    lo, hi = nfft, n - nfft
    np.testing.assert_allclose(got[:, lo:hi], x[:, lo:hi], rtol=0, atol=3e-5)


@pytest.mark.parametrize("nfft,cap_tk", [(1024, 256), (512, 768)])
def test_unpacked_mel_hop8_compiles_and_matches(rng, nfft, cap_tk):
    """The UNPACKED mel kernel (hop=8 — the only hop that divides a pow2
    nfft without being a multiple of 16) at its widest production tile.
    nfft=1024 OOMed Mosaic scoped VMEM at every tk >= 384 (26.9 MB at
    640) — a latent pre-round-4 bug: the old uncapped pick was 512 and
    this path had never been compiled on a chip. Long signal so the
    capped pick is the one compiled."""
    from vv_dsp_tpu.ops import mel as _mel
    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.stft import STFT

    hop, n_mels, sr = 8, 24, 16000.0
    n = (cap_tk + 80) * hop + nfft
    x = jnp.asarray(rng.standard_normal((2, n)), dtype=jnp.float32)
    got = np.asarray(pf.stft_mel_energies_pallas(x, nfft, hop, n_mels, sr,
                                                 interpret=False))
    plan = STFT(nfft, hop)
    re, im = plan.power_parts(x)
    ref = np.asarray(_mel.mel_energies_from_power_parts(re, im, nfft,
                                                        n_mels, sr))
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 5e-6


@pytest.mark.parametrize("nfft,hop,n", [
    (1024, 256, 479232),    # flagship roundtrip geometry, tk=512 pick
    (2048, 512, 200704),    # tk=256 pick
    (4096, 1024, 230400),   # tk=128 pick
])
def test_istft_packed_production_tile_picks(rng, nfft, hop, n):
    """The round-5 inverse kernel at every production tile pick,
    Mosaic-compiled in a DIRECT jit (the VMEM-ceiling lesson: picks that
    only ever compiled inside a bench loop shipped latent OOMs)."""
    from vv_dsp_tpu.ops.stft import STFT

    x = rng.standard_normal((2, n)).astype(np.float32)
    plan = STFT(nfft, hop)
    spec = jax.jit(lambda v: plan.process(v, rfft=True))(jnp.asarray(x))
    got = np.asarray(jax.jit(
        lambda s: plan.reconstruct(s, n, rfft=True))(spec))
    lo, hi = nfft, n - nfft
    np.testing.assert_allclose(got[:, lo:hi], x[:, lo:hi], rtol=0, atol=3e-5)


def test_packed_spectrum_roundtrip_and_mask(rng):
    """The zero-copy PackedSpectrum path on hardware: process_packed ->
    apply_mask(identity) -> reconstruct_packed equals the input on covered
    samples, and a half-band mask matches the natural-order masked
    reconstruct."""
    from vv_dsp_tpu.ops.stft import STFT

    nfft, hop, n = 1024, 256, 479232
    x = rng.standard_normal((2, n)).astype(np.float32)
    plan = STFT(nfft, hop)
    xj = jnp.asarray(x)
    ps = jax.jit(plan.process_packed)(xj)
    got = np.asarray(jax.jit(
        lambda p_re, p_im: plan.reconstruct_packed(
            type(ps)(p_re, p_im, ps.nfft, ps.hop, ps.nf), n))(ps.re, ps.im))
    lo, hi = nfft, n - nfft
    np.testing.assert_allclose(got[:, lo:hi], x[:, lo:hi], rtol=0, atol=3e-5)

    mask = np.zeros(nfft // 2 + 1, np.float32)
    mask[: nfft // 8] = 1.0
    got_m = np.asarray(plan.reconstruct_packed(ps.apply_mask(mask), n))
    spec = plan.process(xj, rfft=True)
    ref_m = np.asarray(plan.reconstruct(spec * jnp.asarray(mask), n,
                                        rfft=True))
    scale = max(1.0, np.abs(ref_m).max())
    assert np.abs(got_m[:, lo:hi] - ref_m[:, lo:hi]).max() / scale < 3e-5
