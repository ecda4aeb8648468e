"""Profiling, benchmarking, and roofline accounting.

The reference ships a custom bench framework emitting JSON result records
{name, elapsed, samples/s, RTF, iterations} (bench/bench_framework.h:31-48)
plus committed profile artifacts (docs/profiles/*.json). TPU-native
equivalents:

- :func:`benchmark` — same record shape (name / elapsed_ms / samples_per_sec
  / rtf / iterations) for any jitted fn, with compile excluded and device
  sync via block_until_ready,
- :func:`trace` — context manager around jax.profiler for on-device
  timelines (view in TensorBoard / Perfetto),
- :class:`Roofline` — per-chip speed-of-light model: given FLOPs and HBM
  bytes of an op, the attainable time bound max(flops/peak, bytes/bw) and
  the achieved fraction. Chip table covers the TPUs this framework targets.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time

import jax


# Peak dense f32-effective FLOP/s and HBM bandwidth per chip. bf16 MXU peaks
# are ~2x the f32 numbers on v4/v5p and ~4x on v5e/v6e.
CHIP_SPECS = {
    # name: (f32 TFLOP/s, HBM GB/s)
    "v4": (137.5, 1228.0),
    "v5e": (98.0, 819.0),
    "v5p": (229.5, 2765.0),
    "v6e": (459.0, 1640.0),
    "cpu": (0.5, 50.0),  # rough, for local runs
}


def detect_chip() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key in ("v6e", "v5e", "v5p", "v4"):
        if key in kind or key.replace("v", "v5 lite") in kind:
            return key
    if "lite" in kind:
        return "v5e"
    return "cpu" if d.platform == "cpu" else "v5e"


@dataclasses.dataclass
class BenchResult:
    """Mirror of vv_dsp_bench_result (bench/bench_framework.h:31-38)."""

    name: str
    elapsed_ms: float
    samples_per_sec: float
    rtf: float  # real-time factor: elapsed / signal duration
    iterations: int

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def benchmark(name: str, fn, *args, n_samples: int | None = None,
              sample_rate: float = 48000.0, iters: int = 20,
              warmup: int = 2) -> BenchResult:
    """Time a device function (compile excluded, device-synced).

    n_samples: samples processed per call (for throughput/RTF); inferred
    from args[0]'s size when omitted.
    """
    if n_samples is None:
        n_samples = int(args[0].size)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_call = dt / iters
    return BenchResult(
        name=name,
        elapsed_ms=per_call * 1e3,
        samples_per_sec=n_samples / per_call,
        rtf=per_call / (n_samples / sample_rate),
        iterations=iters,
    )


def chain_benchmark(name: str, step, x, n_samples: int | None = None,
                    sample_rate: float = 48000.0,
                    iters: int = 200, repeats: int = 3) -> BenchResult:
    """Remote-safe timing: all iterations inside ONE jitted lax.fori_loop
    with iteration k+1 data-dependent on k, one scalar transfer at the end.

    Required on remote-PJRT transports where block_until_ready() is not a
    true sync point (it measured impossible >2000 TFLOPS); on local devices
    it agrees with :func:`benchmark`.

    step(x, acc_scalar) -> scalar must fold `acc` into its input (e.g.
    ``x + acc * 1e-30``) AND reduce the FULL output (e.g. sum) — consuming
    only a slice lets XLA's simplifier prune work back through the dots
    (measured 2x inflation on a dense-basis STFT).

    iters amortizes the per-CALL dispatch overhead (~20-30 ms through the
    remote tunnel — a scalar-only 1000-iteration loop costs the same total
    as a 1-iteration one, so the overhead is per call, not per iteration);
    at the default 200 it biases a 1 ms-class op by ~10%. repeats takes
    best-of-N against transport congestion drift.
    """
    import jax.numpy as jnp
    from jax import lax

    if n_samples is None:
        n_samples = int(x.size)

    @jax.jit
    def run(v):
        return lax.fori_loop(0, iters, lambda i, acc: step(v, acc),
                             jnp.float32(0.0))

    float(run(x))  # compile + warmup
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    per_call = best / iters
    return BenchResult(
        name=name,
        elapsed_ms=per_call * 1e3,
        samples_per_sec=n_samples / per_call,
        rtf=per_call / (n_samples / sample_rate),
        iterations=iters,
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """On-device profiler timeline (open with TensorBoard or Perfetto);
    replaces the reference's host-side monotonic timers with real per-op
    device tracing."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Speed-of-light bound for one op on one chip."""

    flops: float
    hbm_bytes: float
    chip: str = ""

    def _specs(self):
        chip = self.chip or detect_chip()
        tf, gb = CHIP_SPECS.get(chip, CHIP_SPECS["v5e"])
        return tf * 1e12, gb * 1e9

    @property
    def compute_bound(self) -> bool:
        peak_f, peak_b = self._specs()
        return self.flops / peak_f > self.hbm_bytes / peak_b

    @property
    def attainable_seconds(self) -> float:
        peak_f, peak_b = self._specs()
        return max(self.flops / peak_f, self.hbm_bytes / peak_b)

    def achieved_fraction(self, measured_seconds: float) -> float:
        """1.0 = at the roofline; <1 = headroom remains."""
        return self.attainable_seconds / max(measured_seconds, 1e-12)


def fir_roofline(channels: int, n: int, taps: int, chip: str = "") -> Roofline:
    """Direct-form FIR: 2*taps FLOPs/sample, one read + one write."""
    return Roofline(flops=2.0 * channels * n * taps,
                    hbm_bytes=4.0 * channels * (2 * n + taps), chip=chip)


def stft_roofline(channels: int, frames: int, nfft: int,
                  chip: str = "") -> Roofline:
    """Per-frame C2C FFT: 5*N*log2(N) FLOPs, frame in + spectrum out."""
    import math
    return Roofline(
        flops=5.0 * channels * frames * nfft * math.log2(max(nfft, 2)),
        hbm_bytes=4.0 * channels * frames * (nfft + 2 * nfft), chip=chip)


def resample_roofline(channels: int, n_out: int, taps_pp: int,
                      n_in: int, chip: str = "") -> Roofline:
    """Polyphase: 2*taps_pp FLOPs per output, input read + output write."""
    return Roofline(flops=2.0 * channels * n_out * taps_pp,
                    hbm_bytes=4.0 * channels * (n_in + n_out), chip=chip)
