"""Headline benchmark: STFT processing throughput, 1024-pt FFT / 256 hop.

Directly comparable to the reference's stft_profile row
(docs/profiles/stft_profile.json:30-32: 6.38 Msamples/s on a Ryzen 7950X,
scalar build) — same transform semantics (windowed frames -> full C2C
complex spectrum of all nfft bins).

Timing methodology: all iterations run inside ONE jitted lax.fori_loop with
iteration k+1 data-dependent on iteration k, and a single scalar is pulled at
the end. This is required for correctness here: plain block_until_ready() is
not a reliable sync point through remote-PJRT transports (it measured an
impossible 2000+ TFLOPS), while the dependency chain provably serializes the
device work.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BASELINE_MSPS = 6.38  # reference STFT 1024-pt throughput (BASELINE.md)


def chain_time(step, x, iters: int = 20) -> float:
    """Seconds per iteration; step(v, acc) -> scalar, chained through acc."""

    @jax.jit
    def run(v):
        return lax.fori_loop(0, iters, lambda i, acc: step(v, acc),
                             jnp.float32(0.0))

    float(run(x))  # compile + warmup
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / iters


def main():
    from vv_dsp_tpu.ops.stft import STFT

    nfft, hop = 1024, 256
    n = 48000 * 10  # 10 s @ 48 kHz, the reference's pipeline-bench signal
    channels = 16  # batch to fill the chip; throughput counts all samples
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, n)), dtype=jnp.float32)

    plan = STFT(nfft, hop)

    def step(v, acc):
        spec = plan.process(v + acc * 1e-30, rfft=False)
        return jnp.real(spec[0, 0, 0])

    dt = chain_time(step, x)
    msps = channels * n / dt / 1e6
    print(json.dumps({
        "metric": "stft_1024_256_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))


if __name__ == "__main__":
    main()
