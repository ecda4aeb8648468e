"""Benchmark-as-test: the perf gate is part of the test surface, like the
reference registering its bench suites in CTest
(tests/benchmark/CMakeLists.txt:27-36).  The timing gate itself needs the
real TPU (the suite pins jax to an 8-device CPU mesh), so here we verify
the gate MACHINERY — baseline file shape, comparison logic — and skip the
hardware run unless one is attached."""

import json
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "benchmarks", "BENCH_BASELINE.json")
GATE = os.path.join(REPO, "scripts", "check_perf_regression.py")


def test_baseline_file_shape():
    with open(BASELINE) as f:
        data = json.load(f)
    assert "metrics" in data
    metrics = data["metrics"]
    assert "northstar_chain_throughput" in metrics
    assert "stft_1024_256_throughput" in metrics
    for m, row in metrics.items():
        assert row["value"] > 0
        assert row["unit"] == "Msamples/s"


def test_gate_skips_cleanly_without_tpu():
    """Off-TPU the gate must exit 0 with an explicit skip message (CI runs
    it on GitHub runners)."""
    out = subprocess.run([sys.executable, GATE], capture_output=True,
                         text=True, timeout=120,
                         env={**os.environ, "VV_BENCH_FORCE_CPU": "1"})
    assert out.returncode == 0
    assert "skipped" in out.stdout


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="perf gate needs the real TPU")
def test_gate_on_tpu():
    out = subprocess.run([sys.executable, GATE], capture_output=True,
                         text=True, timeout=1800)
    assert out.returncode == 0, out.stdout + out.stderr


def test_compare_catches_synthetic_ten_percent_injection():
    """The gate's comparison logic at its 10% threshold: a synthetic -10.5%
    row must fail, a -5% row must pass (chain-timed best-of-3 rows drift
    ~±4%, so 10% is above noise and below real regressions)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import check_perf_regression as gate

    base = {"rowA": {"value": 1000.0}, "rowB": {"value": 2000.0}}
    rows = {"rowA": {"value": 895.0}, "rowB": {"value": 1900.0}}
    lines, failed = gate.compare(rows, base, threshold=0.10)
    assert len(lines) == 2
    assert len(failed) == 1 and failed[0].startswith("rowA")

    rows_ok = {"rowA": {"value": 950.0}, "rowB": {"value": 2000.0}}
    _, failed_ok = gate.compare(rows_ok, base, threshold=0.10)
    assert not failed_ok

    _, failed_missing = gate.compare({"rowA": {"value": 1000.0}}, base, 0.10)
    assert any("MISSING" in f for f in failed_missing)
