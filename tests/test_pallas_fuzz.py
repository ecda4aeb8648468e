"""Randomized geometry fuzz over the Pallas kernels (interpret mode):
every supported (nfft, hop, window, n, channels) drawn at random must match
the XLA reference paths. The round-2 review found two silent-wrap bugs in
exactly the geometry corners a fixed test grid missed."""

import numpy as np
import pytest
import jax.numpy as jnp

from vv_dsp_tpu.ops import mel as _mel
from vv_dsp_tpu.ops import resample as rs
from vv_dsp_tpu.ops import pallas_fft as pf
from vv_dsp_tpu.ops import pallas_upfirdn as pu
from vv_dsp_tpu.ops.stft import STFT

_R = np.random.default_rng(20260818)
_WINDOWS = ["hann", "hamming", "blackman", "nuttall", "boxcar"]


def _random_stft_geometry():
    nfft = int(2 ** _R.integers(7, 12))           # 128..2048
    divisors = [h for h in (8, 16, 32, 64, 128, 256, 512, 1024, 2048)
                if h <= nfft and nfft % h == 0 and nfft // h <= 128]
    hop = int(_R.choice(divisors))
    win = str(_R.choice(_WINDOWS))
    c = int(_R.integers(1, 4))
    n = int(_R.integers(nfft // 2, 6000))
    return nfft, hop, win, c, n


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_stft_mel(trial):
    nfft, hop, win, c, n = _random_stft_geometry()
    assert pf.stft_mel_supported(nfft, hop), (nfft, hop)
    n_mels = int(_R.integers(8, min(40, nfft // 4)))
    x = jnp.asarray(_R.standard_normal((c, n)).astype(np.float32))
    plan = STFT(nfft, hop, win)
    re, im = plan.power_parts(x)
    want = np.asarray(_mel.mel_energies_from_power_parts(
        re, im, nfft, n_mels, 16000.0))
    got = np.asarray(pf.stft_mel_energies_pallas(
        x, nfft, hop, n_mels, 16000.0, window=win))
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=5e-6,
                               err_msg=f"{(nfft, hop, win, c, n, n_mels)}")


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_gate(trial):
    while True:
        nfft, hop, win, c, n = _random_stft_geometry()
        if hop < nfft:
            break
    thr = float(_R.uniform(0.0, 0.4))
    x = jnp.asarray(_R.standard_normal((c, n)).astype(np.float32))
    pad = nfft - hop
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    plan = STFT(nfft, hop, win)
    re, im = plan.power_parts(xp)
    p2 = re * re + im * im
    peak2 = jnp.max(p2, axis=-1, keepdims=True)
    keep = p2 >= thr * thr * peak2
    z = jnp.zeros_like(re)
    want = np.asarray(plan.reconstruct_parts(
        jnp.where(keep, re, z), jnp.where(keep, im, z),
        xp.shape[-1]))[:, pad:pad + n]
    got = np.asarray(pf.stft_gate_pallas(xp, nfft, hop, thr,
                                         win))[:, pad:pad + n]
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=1e-5,
                               err_msg=f"{(nfft, hop, win, c, n, thr)}")


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_banded_upfirdn(trial):
    up = int(_R.integers(1, 9))
    down = int(_R.integers(1, 9))
    n = int(_R.integers(500, 8000))
    c = int(_R.integers(1, 4))
    x = jnp.asarray(_R.standard_normal((c, n)).astype(np.float32))
    h = rs._resample_poly_filter(max(up, 2), max(down, 2))
    off = int(_R.integers(0, len(h)))
    n_out = -(-n * up // down)
    if not pu.banded_supported(up, down, len(h), off):
        pytest.skip("geometry outside kernel support")
    want = np.asarray(rs._upfirdn_gather(h, x, up, down, off, n_out))
    got = np.asarray(pu.upfirdn_banded_pallas(x, h, up, down, off, n_out))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4,
                               err_msg=f"{(up, down, n, c, off)}")
