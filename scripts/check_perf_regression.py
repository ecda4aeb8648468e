"""Performance-regression gate — the TPU counterpart of the reference's
benchmark-as-test registration (tests/benchmark/CMakeLists.txt:27-36: bench
suites wired into CTest so a perf change is visible in the test harness).

Runs the headline bench (bench.py) and compares every metric against the
committed baseline (benchmarks/BENCH_BASELINE.json).  Exits nonzero if any
metric drops more than --threshold (default 15% — the axon tunnel drifts
~10-20% run-to-run even with best-of-3 chained timing; a real regression
like round 2's unguarded dense-tier dispatch change is far larger).

Usage:
    python scripts/check_perf_regression.py            # gate (TPU required)
    python scripts/check_perf_regression.py --report   # print, never fail
    python scripts/check_perf_regression.py --update   # rewrite baseline

Wired into CI as report-only (GitHub runners have no TPU); run as a gate on
TPU before committing kernel/dispatch changes.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "benchmarks", "BENCH_BASELINE.json")


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
            rows[row["metric"]] = row
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="max allowed fractional drop vs baseline")
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

    rows = run_bench()
    if args.update:
        base = {m: {"value": r["value"], "unit": r["unit"]}
                for m, r in rows.items()}
        with open(BASELINE, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "metrics": base},
                      f, indent=1)
        print(f"baseline updated: {BASELINE}")
        return 0

    with open(BASELINE) as f:
        base = json.load(f)["metrics"]
    failed = []
    for metric, ref in base.items():
        got = rows.get(metric)
        if got is None:
            failed.append(f"{metric}: MISSING from bench output")
            continue
        ratio = got["value"] / ref["value"]
        status = "OK" if ratio >= 1.0 - args.threshold else "REGRESSION"
        print(f"{metric:34s} {got['value']:10.1f} vs baseline "
              f"{ref['value']:10.1f} ({ratio:6.2%})  {status}")
        if status != "OK":
            failed.append(f"{metric}: {ratio:.2%} of baseline "
                          f"(threshold {1 - args.threshold:.0%})")
    if failed and not args.report:
        print("\nPERF REGRESSION:\n  " + "\n  ".join(failed),
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
