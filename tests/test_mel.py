import numpy as np
import jax.numpy as jnp
import pytest

from vv_dsp_tpu.ops import mel as vmel
mel = vmel
from vv_dsp_tpu.ops.stft import power_spectrogram_onesided


def test_mel_hz_roundtrip():
    # tests/mfcc_tests.c:9-38
    for hz in (0.0, 100.0, 440.0, 1000.0, 8000.0):
        m = vmel.hz_to_mel(hz)
        back = vmel.mel_to_hz(m)
        np.testing.assert_allclose(back, hz, rtol=1e-6, atol=1e-3)


def test_htk_formula():
    np.testing.assert_allclose(
        vmel.hz_to_mel(1000.0), 2595.0 * np.log10(1 + 1000.0 / 700.0)
    )
    assert vmel.hz_to_mel(-5.0) == 0.0  # negative clamps


def test_slaney_roundtrip():
    for hz in (50.0, 900.0, 1000.0, 4000.0):
        np.testing.assert_allclose(
            vmel.mel_to_hz(vmel.hz_to_mel(hz, "slaney"), "slaney"), hz, rtol=1e-6
        )


def test_filterbank_area_normalized():
    fb = vmel.mel_filterbank_np(512, 26, 16000.0, 0.0, 8000.0)
    assert fb.shape == (26, 257)
    sums = fb.sum(axis=1)
    np.testing.assert_allclose(sums[sums > 0], 1.0, rtol=1e-10)
    assert (fb >= 0).all()


def test_filterbank_matches_reference_loop():
    # numpy mirror of mel.c:146-180 triangle construction
    n_fft, n_mels, sr, fmin, fmax = 256, 10, 8000.0, 0.0, 4000.0
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(vmel.hz_to_mel(fmin), vmel.hz_to_mel(fmax), n_mels + 2)
    hz = vmel.mel_to_hz(mel_pts)
    freqs = np.arange(n_bins) * sr / n_fft
    ref = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        l, c, r = hz[m], hz[m + 1], hz[m + 2]
        li, ci, ri = np.searchsorted(freqs, [l, c, r])
        for k in range(li, min(ci, n_bins)):
            ref[m, k] = (freqs[k] - l) / (c - l)
        for k in range(ci, min(ri, n_bins)):
            ref[m, k] = (r - freqs[k]) / (r - c)
        s = ref[m].sum()
        if s > 0:
            ref[m] /= s
    got = vmel.mel_filterbank_np(n_fft, n_mels, sr, fmin, fmax)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_filterbank_validation():
    with pytest.raises(ValueError):
        vmel.mel_filterbank_np(64, 40, 8000.0, 0.0, 4000.0)  # n_mels >= bins
    with pytest.raises(ValueError):
        vmel.mel_filterbank_np(256, 10, 8000.0, 0.0, 5000.0)  # fmax > sr/2


def test_log_mel_and_mfcc_shapes(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    p = power_spectrogram_onesided(x, 512, 128)
    lm = vmel.log_mel_spectrogram(p, 512, 26, 16000.0)
    assert lm.shape == (p.shape[0], 26)
    coeffs = vmel.mfcc_from_log_mel(lm, 13, lifter=22.0)
    assert coeffs.shape == (p.shape[0], 13)
    assert np.isfinite(np.asarray(coeffs)).all()


def test_mfcc_matches_manual_pipeline(rng):
    x = rng.standard_normal(2000).astype(np.float32)
    n_fft, n_mels, k = 256, 20, 12
    p = np.asarray(power_spectrogram_onesided(x, n_fft, 64)).astype(np.float64)
    fb = vmel.mel_filterbank_np(n_fft, n_mels, 8000.0, 0.0, 4000.0)
    lm_ref = np.log(p @ fb.T + 1e-10)
    # unnormalized reference DCT-II of each frame, keep k coeffs
    kk = np.arange(n_mels)[:, None]
    mm = np.arange(n_mels)[None, :]
    D = np.cos(np.pi * (mm + 0.5) * kk / n_mels)
    ref = lm_ref @ D.T[:, :k]
    got = np.asarray(
        vmel.mfcc(jnp.asarray(p, dtype=jnp.float32), n_fft, n_mels, k, 8000.0)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_lifter_weights():
    w = vmel._lifter_np(13, 22.0)
    i = np.arange(1, 13)
    np.testing.assert_allclose(w[1:], 1 + 11.0 * np.sin(np.pi * i / 22.0))
    assert w[0] == 1.0


def test_mfcc_from_power_parts_matches_mfcc(rng):
    """The fused (re,im)->mel path (power never materialized) must equal
    mfcc(re^2+im^2, ...) exactly."""
    from vv_dsp_tpu.ops.stft import STFT
    x = jnp.asarray(rng.standard_normal((3, 20000)).astype(np.float32))
    plan = STFT(1024, 256)
    re, im = plan.power_parts(x)
    a = np.asarray(mel.mfcc_from_power_parts(re, im, 1024, 26, 13, 16000.0,
                                             lifter=22.0))
    b = np.asarray(mel.mfcc(plan.power(x), 1024, 26, 13, 16000.0,
                            lifter=22.0))
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-5
