"""Real-world audio coverage: the reference's own fixture
voicebank/_a'ka'sa.wav (44.1 kHz mono 16-bit PCM speech, the WAV behind its
north-star MFCC config) decoded by BOTH of our WAV backends and compared
sample-by-sample against the reference's own reader (src/audio/wav.c,
compiled from source), then run through the full MFCC chain head-to-head
against the reference's STFT+MFCC implementation.
"""

import os
import subprocess

import numpy as np
import pytest

from vv_dsp_tpu.io import wav as wavmod

REF_SRC = "/root/reference"
REF_WAV = os.path.join(REF_SRC, "voicebank", "_a'ka'sa.wav")
BUILD = "/tmp/refbuild"
DRIVER_SRC = os.path.join(os.path.dirname(__file__), "ref_drivers",
                          "wav_mfcc_ref.c")

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_WAV),
                                reason="reference WAV fixture not present")


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    """Compile the reference-linked WAV/MFCC driver (the reference build
    defaults audio I/O off, so src/audio/wav.c is compiled in directly)."""
    libs = []
    for root, _, files in os.walk(BUILD):
        libs += [os.path.join(root, f) for f in files if f.endswith(".a")]
    if not libs:
        pytest.skip("reference static libs not built (run the head-to-head "
                    "suite first or build /tmp/refbuild)")
    exe = str(tmp_path_factory.mktemp("drv") / "wav_mfcc_ref")
    cmd = ["gcc", "-std=gnu99", "-O2", "-I", os.path.join(REF_SRC, "include"),
           "-o", exe, DRIVER_SRC, os.path.join(REF_SRC, "src", "audio",
                                               "wav.c")] + libs + libs + ["-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"cannot compile reference driver: {e}")
    return exe


def _run(exe, *args):
    r = subprocess.run([exe, *map(str, args)], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[:400]
    return r.stdout


@pytest.fixture(scope="module")
def decoded():
    """(native_audio, numpy_audio, sample_rate) from our two backends."""
    native, sr = wavmod.read_wav(REF_WAV)
    np_audio, sr2 = wavmod._read_np(REF_WAV)
    assert sr == sr2
    return native, np_audio, sr


def test_wav_info_both_backends_vs_reference(driver):
    ref = _run(driver, REF_WAV, "info").split()
    frames, channels, rate, bits, isf = (int(ref[0]), int(ref[1]),
                                         float(ref[2]), int(ref[3]),
                                         int(ref[4]))
    info = wavmod.wav_info(REF_WAV)  # native backend
    assert (info.frames, info.channels, info.sample_rate, info.bits,
            info.is_float) == (frames, channels, rate, bits, bool(isf))
    with open(REF_WAV, "rb") as f:  # numpy backend's parser
        (tag, ch, sr, b), data_bytes = wavmod._parse_header_np(f)
    assert (ch, sr, b, data_bytes // (ch * b // 8)) == (channels, rate, bits,
                                                        frames)


def test_wav_data_both_backends_vs_reference(driver, decoded):
    native, np_audio, _ = decoded
    # our two backends must agree bit-for-bit
    np.testing.assert_array_equal(native, np_audio)
    ref = np.array([float(v) for v in _run(driver, REF_WAV, "data").split()],
                   dtype=np.float32).reshape(native.shape)
    # both divide int16 by 32768 -> identical f32 values expected
    np.testing.assert_array_equal(native, ref)


def test_mfcc_chain_head_to_head_on_real_speech(driver, decoded):
    """Full chain on real speech: our STFT power -> mel -> MFCC vs the
    reference's vv_dsp_stft_spectrogram + vv_dsp_mfcc_process."""
    import jax
    import jax.numpy as jnp
    from vv_dsp_tpu.models import MFCCFrontend

    native, _, sr = decoded
    nfft, hop, nmels, nmfcc, lifter = 1024, 256, 26, 13, 22.0
    ref_rows = np.array([[float(v) for v in line.split()]
                         for line in _run(driver, REF_WAV, "mfcc", nfft, hop,
                                          nmels, nmfcc, lifter).splitlines()])
    fe = MFCCFrontend(nfft=nfft, hop=hop, n_mels=nmels, n_mfcc=nmfcc,
                      sample_rate=float(sr), lifter=lifter)
    ours = np.asarray(jax.jit(fe)(jnp.asarray(native))[0])
    assert ours.shape == ref_rows.shape
    scale = np.abs(ref_rows).max()
    np.testing.assert_allclose(ours, ref_rows, rtol=0, atol=1e-3 * scale)
