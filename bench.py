"""Headline benchmark: STFT processing throughput, 1024-pt FFT / 256 hop.

Directly comparable to the reference's stft_profile row
(docs/profiles/stft_profile.json:30-32: 6.38 Msamples/s on a Ryzen 7950X,
scalar build) — same transform semantics (windowed frames -> full C2C
complex spectrum). Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_MSPS = 6.38  # reference STFT 1024-pt throughput (BASELINE.md)


def main():
    from vv_dsp_tpu.ops.stft import STFT

    nfft, hop = 1024, 256
    n = 48000 * 10  # 10 s @ 48 kHz, the reference's pipeline-bench signal
    channels = 16  # batch to fill the chip; throughput counts all samples
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, n)), dtype=jnp.float32)

    plan = STFT(nfft, hop)
    fn = jax.jit(lambda v: plan.process(v, rfft=False))
    fn(x).block_until_ready()  # compile

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(x).block_until_ready()
    dt = time.perf_counter() - t0

    msps = channels * n * iters / dt / 1e6
    print(json.dumps({
        "metric": "stft_1024_256_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))


if __name__ == "__main__":
    main()
