"""Build-and-consume packaging smoke test — the analog of the reference's
vcpkg consumer smoke tests (vcpkg-test-consumer/, SURVEY 2.11): build the
wheel, then import and drive the installed tree from OUTSIDE the repo,
including the native codec compiled from its installed location."""

import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    dist = tmp_path_factory.mktemp("dist")
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", REPO, "--no-deps",
         "--no-build-isolation", "-w", str(dist)],
        capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"pip wheel unavailable: {r.stderr[-300:]}")
    whl = next(dist.glob("*.whl"))
    return whl


def test_wheel_contents(wheel):
    names = zipfile.ZipFile(wheel).namelist()
    assert "csrc/wavio.cpp" in names  # native codec source ships
    for mod in ("vv_dsp_tpu/__init__.py", "vv_dsp_tpu/ops/fft.py",
                "vv_dsp_tpu/parallel/__init__.py", "vv_dsp_tpu/io/wav.py",
                "vv_dsp_tpu/tools/dump_fft.py"):
        assert mod in names, f"{mod} missing from wheel"
    # the vv-dsp umbrella CLI is registered as a console entry point
    zf = zipfile.ZipFile(wheel)
    ep = next(n for n in names if n.endswith("entry_points.txt"))
    text = zf.read(ep).decode()
    assert "vv-dsp = vv_dsp_tpu.tools.__main__:main" in text


def test_installed_tree_runs(wheel, tmp_path):
    """Unpack the wheel as an install tree and drive WAV I/O + an FFT from a
    cwd far away from the repo (catches repo-relative path assumptions)."""
    site = tmp_path / "site"
    zipfile.ZipFile(wheel).extractall(site)
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import vv_dsp_tpu
from vv_dsp_tpu.io import write_wav, read_wav
from vv_dsp_tpu.ops import fft
sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4800) / 48000)).astype(np.float32)
write_wav("out.wav", sig, 48000)
audio, sr = read_wav("out.wav")
assert sr == 48000 and audio.shape[-1] == 4800
s = fft.rfft(jnp.asarray(sig), 1024)
assert s.shape[-1] == 513
print("INSTALLED_OK", vv_dsp_tpu.__name__)
"""
    env = dict(os.environ, PYTHONPATH=str(site))
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "INSTALLED_OK" in r.stdout


def test_version_consistent_everywhere():
    """pyproject, __version__ and the CHANGELOG top entry must agree —
    the gate scripts/make_release.py enforces at release time."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import make_release
        versions = make_release.read_versions()
    finally:
        sys.path.pop(0)
    assert len(set(versions.values())) == 1 and None not in versions.values(), versions
