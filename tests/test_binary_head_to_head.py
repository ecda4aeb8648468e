"""Strongest parity evidence: BUILD the reference C library and compare its
tool binaries' stdout against ours on identical fixtures, sample by sample.
17 op configurations, all within float32 tolerance (worst case the STFT
roundtrip at ~5e-4 — different FFT kernels on both sides of an OLA divide).

Requires the reference checkout and a C toolchain; skipped otherwise. The
build goes to a cached temp dir (the reference tree itself is read-only).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference"
BUILD = "/tmp/refbuild"
OURS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tools_bin"))

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_SRC),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_tools(tmp_path_factory):
    tools = os.path.join(BUILD, "tools")
    if not os.path.isfile(os.path.join(tools, "vv_dsp_dump_fft")):
        try:
            subprocess.run(
                ["cmake", "-S", REF_SRC, "-B", BUILD,
                 "-DCMAKE_BUILD_TYPE=Release", "-DVV_DSP_BUILD_TESTS=OFF"],
                check=True, capture_output=True, timeout=600)
            subprocess.run(["cmake", "--build", BUILD, "-j8"], check=True,
                           capture_output=True, timeout=900)
        except (OSError, subprocess.SubprocessError) as e:
            pytest.skip(f"cannot build reference: {e}")
    return tools


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fx")
    rng = np.random.default_rng(42)
    xr = rng.standard_normal(256).astype(np.float32)
    (d / "real.txt").write_text("\n".join("%.9g" % v for v in xr))
    xc = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
          ).astype(np.complex64)
    (d / "cpx.txt").write_text(
        "\n".join(f"{v.real:.9g},{v.imag:.9g}" for v in xc))
    xh = (rng.standard_normal(129) + 1j * rng.standard_normal(129)
          ).astype(np.complex64)
    (d / "herm.txt").write_text(
        "\n".join(f"{v.real:.9g},{v.imag:.9g}" for v in xh))
    x2k = rng.standard_normal(2048).astype(np.float32)
    (d / "sig2k.txt").write_text("\n".join("%.9g" % v for v in x2k))
    return d


def _run(bin_, args, stdin=None):
    r = subprocess.run([bin_, *map(str, args)], capture_output=True,
                       text=True, input=stdin, timeout=300)
    assert r.returncode == 0, (bin_, r.stderr[:300])
    return r.stdout


def _reals(s):
    return np.array([float(l) for l in s.split() if l.strip()])


def _cpx(s):
    return np.array([complex(float(a), float(b))
                     for a, b in (l.split(",") for l in s.splitlines()
                                  if l.strip())])


W = np.exp(-2j * np.pi / 256)
CASES = [
    # (tool, args(fmt with fixture dir), parser, rel tol)
    ("fft", ["--type", "c2c", "--dir", "fwd", "-n", 256, "--infile",
             "{d}/cpx.txt"], _cpx, 1e-4),
    ("fft", ["--type", "r2c", "--dir", "fwd", "-n", 256, "--infile",
             "{d}/real.txt"], _cpx, 1e-4),
    ("fft", ["--type", "c2r", "--dir", "inv", "-n", 256, "--infile",
             "{d}/herm.txt"], _reals, 1e-4),
    ("dct", ["--type", 2, "--dir", "fwd", "-n", 256, "--infile",
             "{d}/real.txt"], _reals, 1e-4),
    ("dct", ["--type", 3, "--dir", "fwd", "-n", 256, "--infile",
             "{d}/real.txt"], _reals, 1e-4),
    ("dct", ["--type", 4, "--dir", "fwd", "-n", 256, "--infile",
             "{d}/real.txt"], _reals, 1e-4),
    ("dct", ["--type", 2, "--dir", "inv", "-n", 256, "--infile",
             "{d}/real.txt"], _reals, 1e-4),
    ("fir", ["--num-taps", 63, "--cutoff", 0.3, "--win", "hamming", "--n",
             2048, "--infile", "{d}/sig2k.txt"], _reals, 1e-4),
    ("fir_coeffs", ["--num-taps", 63, "--cutoff", 0.3, "--win", "blackman"],
     _reals, 1e-5),
    ("iir", ["--b0", 0.2, "--b1", 0.3, "--b2", 0.2, "--a1", -0.5, "--a2",
             0.2, "--n", 2048, "--infile", "{d}/sig2k.txt"], _reals, 1e-4),
    ("stft_roundtrip", ["--fft", 256, "--hop", 64, "--win", "hann", "--n",
                        2048, "--infile", "{d}/sig2k.txt"], _reals, 3e-3),
    ("resample", ["--num", 2, "--den", 1, "--quality", "linear", "--infile",
                  "{d}/sig2k.txt"], _reals, 1e-5),
    ("resample", ["--num", 3, "--den", 2, "--quality", "sinc:32", "--infile",
                  "{d}/sig2k.txt"], _reals, 1e-4),
    ("czt", ["--N", 256, "--M", 256, "--Wre", f"{W.real:.17g}", "--Wim",
             f"{W.imag:.17g}", "--Are", 1, "--Aim", 0, "--infile",
             "{d}/real.txt"], _cpx, 1e-3),
    ("hilbert", ["-n", 256, "--fs", 1000, "--f", 125, "--phase", 0], _cpx,
     1e-4),
]


@pytest.mark.parametrize("tool,args,parse,tol", CASES,
                         ids=[f"{c[0]}-{i}" for i, c in enumerate(CASES)])
def test_binary_head_to_head(ref_tools, fixtures, tool, args, parse, tol):
    args = [str(a).format(d=fixtures) for a in args]
    ref = parse(_run(os.path.join(ref_tools, f"vv_dsp_dump_{tool}"), args))
    got = parse(_run(os.path.join(OURS, f"dump_{tool}"), args))
    assert ref.shape == got.shape
    scale = max(np.abs(ref).max(), 1e-9)
    np.testing.assert_allclose(got, ref, rtol=0, atol=tol * scale)


def test_stats_and_mfcc_head_to_head(ref_tools, fixtures):
    x = _reals((fixtures / "sig2k.txt").read_text())[:256]
    stdin = "\n".join("%.9g" % v for v in x)
    ref = _reals(_run(os.path.join(ref_tools, "vv_dsp_dump_stats"),
                      ["autocorr", 256, 0], stdin))
    got = _reals(_run(os.path.join(OURS, "dump_stats"),
                      ["autocorr", 256, 0], stdin))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())

    def rows(s):
        return np.array([[float(v) for v in l.split()]
                         for l in s.splitlines()
                         if l and not l.startswith("#")])

    m = ["--n-mels", 26, "--n-mfcc", 13, "--lifter", 22]
    ref = rows(_run(os.path.join(ref_tools, "vv_dsp_dump_mfcc"), m))
    got = rows(_run(os.path.join(OURS, "dump_mfcc"), m))
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())
