"""CLI tool parity: drive python -m vv_dsp_tpu.tools.dump_* via subprocess
with text fixtures and cross-validate stdout against NumPy/SciPy — the same
mechanism (and tolerances) as the reference's python/test_*.py validators
(SURVEY.md section 4 tier 3)."""

import math
import subprocess
import sys

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")


def run_tool(tool, *args, stdin=None):
    cmd = [sys.executable, "-m", f"vv_dsp_tpu.tools.{tool}", *map(str, args)]
    res = subprocess.run(cmd, capture_output=True, text=True, input=stdin,
                         timeout=300, cwd="/root/repo")
    assert res.returncode == 0, res.stderr
    return res.stdout


def parse_reals(out):
    return np.asarray([float(l) for l in out.splitlines()
                       if l.strip() and not l.startswith("#")])


def parse_complex(out):
    vals = []
    for l in out.splitlines():
        if not l.strip() or l.startswith("#"):
            continue
        re, im = l.split(",")
        vals.append(complex(float(re), float(im)))
    return np.asarray(vals)


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def write_reals(path, x):
    with open(path, "w") as f:
        for v in x:
            f.write(f"{float(v):.9g}\n")


def write_complex(path, x):
    with open(path, "w") as f:
        for v in x:
            f.write(f"{float(v.real):.9g},{float(v.imag):.9g}\n")


# --- py-fft parity (python/test_fft.py, rtol/atol 5e-5) ---------------------

@pytest.mark.parametrize("n", [16, 64, 96])
def test_dump_fft_c2c(tmp_path, rng, n):
    x = (rng.random(n) + 1j * rng.random(n)).astype(np.complex64)
    p = tmp_path / "in.txt"
    write_complex(p, x)
    out = parse_complex(run_tool("dump_fft", "--type", "c2c", "--dir", "fwd",
                                 "-n", n, "--infile", p))
    np.testing.assert_allclose(out, np.fft.fft(x), rtol=5e-5, atol=5e-5)


def test_dump_fft_r2c_c2r(tmp_path, rng):
    n = 64
    x = rng.random(n).astype(np.float32)
    p = tmp_path / "in.txt"
    write_reals(p, x)
    out = parse_complex(run_tool("dump_fft", "--type", "r2c", "--dir", "fwd",
                                 "-n", n, "--infile", p))
    np.testing.assert_allclose(out, np.fft.rfft(x), rtol=5e-5, atol=5e-5)
    xh = np.fft.rfft(x)
    p2 = tmp_path / "in2.txt"
    write_complex(p2, xh)
    back = parse_reals(run_tool("dump_fft", "--type", "c2r", "--dir", "inv",
                                "-n", n, "--infile", p2))
    np.testing.assert_allclose(back, x, rtol=5e-5, atol=5e-5)


# --- py-filters parity (python/test_filters.py, 3e-3) -----------------------

def test_dump_fir_matches_lfilter(tmp_path, rng):
    n, taps = 256, 31
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    cpath = tmp_path / "h.txt"
    out = parse_reals(run_tool("dump_fir", "--num-taps", taps, "--cutoff", 0.25,
                               "--win", "hamming", "--n", n, "--infile", p,
                               "--dump-coeffs", cpath))
    h = parse_reals(cpath.read_text())
    assert len(h) == taps
    want = scipy_signal.lfilter(h, [1.0], x)
    np.testing.assert_allclose(out, want, rtol=3e-3, atol=3e-3)
    # design symmetry h[i] == h[N-1-i] (tests/filter_tests.c:7-15)
    np.testing.assert_allclose(h, h[::-1], rtol=1e-6, atol=1e-8)


def test_dump_iir_matches_lfilter(tmp_path, rng):
    n = 256
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    b = [0.2929, 0.5858, 0.2929]
    a1, a2 = -0.0, 0.1716
    out = parse_reals(run_tool("dump_iir", "--b0", b[0], "--b1", b[1],
                               "--b2", b[2], "--a1", a1, "--a2", a2,
                               "--n", n, "--infile", p))
    want = scipy_signal.lfilter(b, [1.0, -a1, -a2], x)
    np.testing.assert_allclose(out, want, rtol=3e-3, atol=3e-3)


# --- py-stft parity (python/test_stft.py, 5e-2) -----------------------------

def test_dump_stft_roundtrip(tmp_path, rng):
    n, nfft, hop = 2048, 256, 128
    t = np.arange(n)
    x = np.sin(2 * math.pi * 0.01 * t).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    out = parse_reals(run_tool("dump_stft_roundtrip", "--fft", nfft, "--hop",
                               hop, "--win", "hann", "--n", n, "--infile", p))
    assert len(out) == n
    # interior reconstructs the signal
    np.testing.assert_allclose(out[nfft:-nfft], x[nfft:-nfft], rtol=5e-2,
                               atol=5e-2)


# --- py-czt parity (python/test_czt.py, 2e-4) -------------------------------

def test_dump_czt_dft_equivalence(tmp_path, rng):
    n = 50
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    w = np.exp(-2j * math.pi / n)
    out = parse_complex(run_tool(
        "dump_czt", "--N", n, "--M", n, "--Wre", w.real, "--Wim", w.imag,
        "--Are", 1.0, "--Aim", 0.0, "--infile", p))
    np.testing.assert_allclose(out, np.fft.fft(x), rtol=2e-4, atol=2e-4)


# --- py-dct parity (python/test_dct.py, roundtrip 1e-4) ---------------------

@pytest.mark.parametrize("n", [7, 8, 63, 64, 257])
def test_dump_dct_roundtrip(tmp_path, rng, n):
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    fwd = parse_reals(run_tool("dump_dct", "--type", 2, "--dir", "fwd", "-n",
                               n, "--infile", p))
    p2 = tmp_path / "y.txt"
    write_reals(p2, fwd)
    back = parse_reals(run_tool("dump_dct", "--type", 2, "--dir", "inv", "-n",
                                n, "--infile", p2))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


# --- py-resampler parity (python/test_resampler.py, 5e-2) -------------------

def test_dump_resample_linear(tmp_path, rng):
    n, num, den = 256, 2, 1
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    p = tmp_path / "x.txt"
    write_reals(p, x)
    out = parse_reals(run_tool("dump_resample", "--num", num, "--den", den,
                               "--quality", "linear", "--infile", p))
    out_n = (n - 1) * num // den + 1
    assert len(out) == out_n
    pos = np.arange(out_n) * den / num
    want = np.interp(pos, np.arange(n), x)
    np.testing.assert_allclose(out, want, rtol=5e-2, atol=5e-2)


def test_dump_resample_sinc_tone(tmp_path):
    n = 512
    t = np.arange(n)
    x = np.sin(2 * math.pi * 0.02 * t).astype(np.float32)
    p = "/tmp/claude-0/sinc_in.txt"
    import tempfile, os
    fd, p = tempfile.mkstemp(suffix=".txt"); os.close(fd)
    write_reals(p, x)
    out = parse_reals(run_tool("dump_resample", "--num", 2, "--den", 1,
                               "--quality", "sinc:32", "--infile", p))
    os.unlink(p)
    want = np.sin(2 * math.pi * 0.02 * (np.arange(len(out)) / 2))
    np.testing.assert_allclose(out[64:-64], want[64:-64], atol=0.05)


# --- py-stats parity (python/test_stats.py, 1e-4) ---------------------------

def test_dump_stats_autocorr(rng):
    n = 128
    x = (rng.random(n) * 2 - 1).astype(np.float32)
    stdin = "\n".join(f"{float(v):.9g}" for v in x)
    out = parse_reals(run_tool("dump_stats", "autocorr", n, 0, stdin=stdin))
    xm = x  # reference autocorr is not mean-removed
    want = np.array([np.dot(xm[:n - k], xm[k:]) / (n - k) for k in range(n)])
    np.testing.assert_allclose(out[: n - 1], want[: n - 1], rtol=1e-4,
                               atol=1e-4)


# --- hilbert tool ----------------------------------------------------------

def test_dump_hilbert():
    out = run_tool("dump_hilbert", "-n", 256, "--fs", 1000.0, "--f", 125.0,
                   "--phase", 0.0)
    xa = parse_complex(out)
    assert len(xa) == 256
    t = np.arange(256)
    x = np.sin(2 * math.pi * 125.0 * t / 1000.0)
    np.testing.assert_allclose(xa.real, x, atol=1e-3)


# --- mfcc tool -------------------------------------------------------------

def test_dump_mfcc_format():
    out = run_tool("dump_mfcc", "--n-mels", 26, "--n-mfcc", 13)
    rows = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert len(rows) == 10
    assert all(len(r.split()) == 13 for r in rows)
    # all frames identical (synthetic constant spectrogram)
    assert rows[0] == rows[1]


def test_bench_czt_smoke():
    out = run_tool("bench_czt", 128, 128, 2)
    assert "CZT bench:" in out and "Peak bin:" in out
    # bin-centered 37-cycle tone must peak at bin 37
    assert "Peak bin: 37" in out


def test_dump_dct_default_input():
    # without --infile the reference uses i % 7 — check determinism
    a = parse_reals(run_tool("dump_dct", "--type", 2, "--dir", "fwd", "-n", 16))
    b = parse_reals(run_tool("dump_dct", "--type", 2, "--dir", "fwd", "-n", 16))
    np.testing.assert_array_equal(a, b)
    x = (np.arange(16) % 7).astype(np.float64)
    want = np.array([np.sum(x * np.cos(np.pi * (np.arange(16) + 0.5) * k / 16))
                     for k in range(16)])
    np.testing.assert_allclose(a, want, rtol=1e-4, atol=1e-4)
