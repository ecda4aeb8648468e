#!/usr/bin/env python
"""Release builder — the analog of the reference's install/export + vcpkg
packaging lane (reference CMakeLists.txt:551-628, vcpkg.json): build sdist +
wheel, verify version consistency across the three places a version lives,
and run the consumer smoke test against the fresh wheel.

Usage:  python scripts/make_release.py [--outdir dist]

Produces dist/vv_dsp_tpu-<ver>.tar.gz and dist/vv_dsp_tpu-<ver>-*.whl and
exits non-zero if any gate fails.
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def read_versions() -> dict:
    pyproject = (REPO / "pyproject.toml").read_text()
    m = re.search(r'^version\s*=\s*"([^"]+)"', pyproject, re.M)
    init = (REPO / "vv_dsp_tpu" / "__init__.py").read_text()
    m2 = re.search(r'^__version__\s*=\s*"([^"]+)"', init, re.M)
    changelog = (REPO / "CHANGELOG.md").read_text()
    m3 = re.search(r"^## (\S+)", changelog, re.M)
    return {
        "pyproject.toml": m.group(1) if m else None,
        "vv_dsp_tpu.__version__": m2.group(1) if m2 else None,
        "CHANGELOG.md top entry": m3.group(1) if m3 else None,
    }


def check_versions() -> str:
    vs = read_versions()
    uniq = set(vs.values())
    if len(uniq) != 1 or None in uniq:
        lines = "\n".join(f"  {k}: {v}" for k, v in vs.items())
        sys.exit(f"version mismatch:\n{lines}")
    ver = uniq.pop()
    print(f"version: {ver} (consistent across {len(vs)} sources)")
    return ver


def build(outdir: Path) -> tuple[Path, Path]:
    outdir.mkdir(parents=True, exist_ok=True)
    # --no-isolation: this environment is offline; setuptools is preinstalled
    subprocess.run(
        [sys.executable, "-m", "build", "--no-isolation",
         "--outdir", str(outdir), str(REPO)],
        check=True)
    sdist = next(outdir.glob("*.tar.gz"))
    wheel = next(outdir.glob("*.whl"))
    return sdist, wheel


def smoke(wheel: Path) -> None:
    names = zipfile.ZipFile(wheel).namelist()
    required = [
        "vv_dsp_tpu/__init__.py",
        "vv_dsp_tpu/ops/fft.py",
        "vv_dsp_tpu/parallel/__init__.py",
        "vv_dsp_tpu/io/wav.py",
        "csrc/wavio.cpp",
    ]
    missing = [n for n in required if n not in names]
    if missing:
        sys.exit(f"wheel missing required members: {missing}")
    print(f"wheel smoke: {len(names)} members, all required present")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=str(REPO / "dist"))
    args = ap.parse_args()
    ver = check_versions()
    sdist, wheel = build(Path(args.outdir))
    smoke(wheel)
    print(f"release {ver} ready:\n  {sdist}\n  {wheel}")
    print("next: run `python -m pytest tests/test_packaging.py -q` for the "
          "full consumer smoke, then tag v" + ver)


if __name__ == "__main__":
    main()
