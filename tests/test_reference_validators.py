"""THE parity capstone: run the REFERENCE library's own Python/SciPy
cross-validation scripts (python/test_*.py, SURVEY.md section 4 tier 3),
completely unmodified, against this framework via the executable shims in
tools_bin/ — the same way the reference's CMake wires them to its built C
binaries (CMakeLists.txt:473-502). Skipped when the reference checkout is
not present."""

import os
import subprocess
import sys

import pytest

REF = "/root/reference/python"
BIN = os.path.join(os.path.dirname(__file__), "..", "tools_bin")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

CASES = [
    ("test_fft.py", ["--fft-bin", "dump_fft"]),
    ("test_czt.py", ["--czt-bin", "dump_czt"]),
    ("test_dct.py", ["--dct-bin", "dump_dct"]),
    ("test_filters.py", ["--fir-bin", "vv_dsp_dump_fir",
                         "--iir-bin", "vv_dsp_dump_iir"]),
    ("test_stft.py", ["--stft-bin", "dump_stft_roundtrip"]),
    ("test_resampler.py", ["--resample-bin", "dump_resample"]),
    ("test_stats.py", ["--stats-bin", "dump_stats"]),
    # librosa-gated concept validator (no binary to drive — the reference
    # never builds its optional framing tool); exits SKIP_CODE without
    # librosa, which this image doesn't ship
    ("test_framing.py", []),
]


@pytest.mark.parametrize("script,args", CASES, ids=[c[0] for c in CASES])
def test_reference_validator(script, args, tmp_path):
    resolved = []
    for a in args:
        resolved.append(a if a.startswith("--")
                        else os.path.abspath(os.path.join(BIN, a)))
    # run from a temp dir (the validators write fixtures into cwd) with the
    # reference's python/ on sys.path for its common.py import
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REF, script), *resolved],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
        env=env)
    if res.returncode == 77:  # validator's own skip code
        pytest.skip(res.stdout.strip())
    assert res.returncode == 0, res.stdout + res.stderr
