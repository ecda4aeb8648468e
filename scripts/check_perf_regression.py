"""Performance-regression gate — the TPU counterpart of the reference's
benchmark-as-test registration (tests/benchmark/CMakeLists.txt:27-36: bench
suites wired into CTest so a perf change is visible in the test harness).

Two scopes:

  default  — the headline bench (bench.py, 2 metrics) vs
             benchmarks/BENCH_BASELINE.json at --threshold 10%.
  --suite  — EVERY benchmarks/run_suite.py row vs
             benchmarks/SUITE_BASELINE.json at the same threshold; rows
             are chain-timed best-of-3 inside the harness
             (utils/profiling.chain_benchmark repeats), which bounds
             tunnel drift to ~±4% — a 10% gate therefore catches real
             regressions the old 15%/2-metric gate could not.

Usage:
    python scripts/check_perf_regression.py                  # headline gate
    python scripts/check_perf_regression.py --suite          # full-suite gate
    python scripts/check_perf_regression.py [--suite] --update  # new baseline
    python scripts/check_perf_regression.py --report         # never fail

Wired into CI as report-only (GitHub runners have no TPU); run as a gate on
TPU before committing kernel/dispatch changes (see docs/RELEASING.md).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "benchmarks", "BENCH_BASELINE.json")
SUITE_BASELINE = os.path.join(REPO, "benchmarks", "SUITE_BASELINE.json")


def run_bench():
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        print(out.stdout)
        print(out.stderr, file=sys.stderr)
        raise SystemExit("bench.py failed")
    rows = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            row = json.loads(line)
            rows[row["metric"]] = {"value": row["value"],
                                   "unit": row["unit"]}
    return rows


def run_suite():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "run_suite.py")],
        capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stdout)
        print(out.stderr, file=sys.stderr)
        raise SystemExit("run_suite.py failed")
    rows = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"name"' in line:
            row = json.loads(line)
            rows[row["name"]] = {"value": row["samples_per_sec"],
                                 "unit": "samples/s"}
    return rows


def compare(rows: dict, base: dict, threshold: float):
    """Per-metric comparison; returns (lines, failures).  Pure function so
    the synthetic-injection test can drive it without hardware."""
    lines, failed = [], []
    for metric, ref in base.items():
        got = rows.get(metric)
        if got is None:
            failed.append(f"{metric}: MISSING from bench output")
            continue
        ratio = got["value"] / ref["value"]
        status = "OK" if ratio >= 1.0 - threshold else "REGRESSION"
        lines.append(f"{metric:34s} {got['value']:14.1f} vs baseline "
                     f"{ref['value']:14.1f} ({ratio:6.2%})  {status}")
        if status != "OK":
            failed.append(f"{metric}: {ratio:.2%} of baseline "
                          f"(threshold {1 - threshold:.0%})")
    return lines, failed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="max allowed fractional drop vs baseline")
    ap.add_argument("--suite", action="store_true",
                    help="gate every run_suite.py row (not just headline)")
    ap.add_argument("--report", action="store_true",
                    help="print comparison, always exit 0")
    ap.add_argument("--update", action="store_true",
                    help="rewrite the baseline from a fresh run")
    args = ap.parse_args()

    import jax
    if os.environ.get("VV_BENCH_FORCE_CPU"):
        # the JAX_PLATFORMS env var is ignored on hosts whose sitecustomize
        # pre-registers the TPU plugin; this in-process override is not
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    if backend != "tpu" and not args.report:
        print(f"no TPU (backend={backend}); perf gate skipped (exit 0). "
              "Run with --report for an informational CPU comparison.")
        return 0

    path = SUITE_BASELINE if args.suite else BASELINE
    rows = run_suite() if args.suite else run_bench()
    if args.update:
        with open(path, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "metrics": rows},
                      f, indent=1)
        print(f"baseline updated: {path}")
        return 0

    with open(path) as f:
        base = json.load(f)["metrics"]
    lines, failed = compare(rows, base, args.threshold)
    print("\n".join(lines))
    if failed and not args.report:
        print("\nPERF REGRESSION:\n  " + "\n  ".join(failed),
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
