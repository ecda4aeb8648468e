"""Per-stage roofline accounting for the flagship NorthStarChain on the real
TPU.

For each stage (FIR -> resample -> STFT power -> mel+MFCC) and for the fused
full chain this measures chained-fori-loop time (the only trustworthy timing
over the axon tunnel) and compares it against the stage's algorithmic
speed-of-light: max(min_flops / peak_flops, min_bytes / peak_bw), where
min_flops/min_bytes are the ALGORITHM's intrinsic work (not the
implementation's), peak_flops is the MEASURED f32 matmul peak (59 TFLOP/s on
this v5e through chained timing; the 98 TF spec number is not reachable in
f32-HIGHEST) and peak_bw the HBM spec.

Writes benchmarks/roofline_northstar.json.

Timing (round-3 correction): the tunnel's overhead is ~20-30 ms per CALL,
not per iteration — a scalar-only 1000-iteration fori_loop costs the same
total as a 1-iteration one.  Round 2 ran 10 iterations and misread the
2.5 ms/iter quotient as a hardware floor, understating every stage 2-4x.
This script now amortizes over ITERS=100 iterations (residual bias
~0.25 ms/iter, reported as overhead_ms_per_iter) and takes best-of-3
against transport congestion.
"""

import json
import math
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys
sys.path.insert(0, REPO)

MEASURED_PEAK_TFLOPS = 59.0   # 4096^3 f32 matmul, chained timing, this chip
HBM_GBPS = 819.0              # v5e spec
ITERS = 100


def chain_time(step, x, iters=ITERS):
    @jax.jit
    def run(v):
        return lax.fori_loop(0, iters, lambda i, acc: step(v, acc),
                             jnp.float32(0.0))

    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def scalar_floor():
    """Residual per-iteration overhead at ITERS: the per-call dispatch
    (~25 ms) divided by ITERS, measured with a scalar-only body."""
    return chain_time(lambda v, acc: acc * 0.9999 + v * 1e-30,
                      jnp.float32(1.0))


def roofline_ms(flops, bytes_):
    t = max(flops / (MEASURED_PEAK_TFLOPS * 1e12), bytes_ / (HBM_GBPS * 1e9))
    return t * 1e3, ("compute" if flops / (MEASURED_PEAK_TFLOPS * 1e12)
                     > bytes_ / (HBM_GBPS * 1e9) else "hbm")


def main():
    from vv_dsp_tpu.models import NorthStarChain
    from vv_dsp_tpu.ops import mel as _mel
    from vv_dsp_tpu.ops import pallas_kernels as _pk
    from vv_dsp_tpu.ops import resample as _rs

    chain = NorthStarChain()
    ch, n = 16, 479232
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ch, n)), dtype=jnp.float32)

    n_rs = n * chain.up // chain.down           # 638976
    frames = 1 + (n_rs - chain.nfft + chain.hop) // chain.hop
    bins = chain.nfft // 2 + 1
    taps_pp = -(-(2 * 10 * max(chain.up, chain.down) + 1) // chain.up)

    y1 = jnp.asarray(rng.standard_normal((ch, n)), dtype=jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((ch, n_rs)), dtype=jnp.float32)
    pw = jnp.asarray(
        rng.standard_normal((ch, frames, bins)) ** 2, dtype=jnp.float32)

    # (name, fn(input)->array, input, min_flops, min_bytes)
    f32 = 4
    stages = [
        ("fir_1024", lambda v: _pk.fir_apply_best(chain.fir_coeffs, v), x,
         2.0 * ch * n * chain.fir_taps, f32 * ch * 2 * n),
        ("resample_4_3", lambda v: _pk.resample_poly_best(
            v, chain.up, chain.down), y1,
         2.0 * ch * n_rs * taps_pp, f32 * ch * (n + n_rs)),
        ("fir_resample_fused", lambda v: _rs.fir_resample_fused(
            chain.fir_coeffs, v, chain.up, chain.down,
            algorithm=chain.head_algorithm), x,
         # algorithmic min of the pair: FIR flops + polyphase flops, one
         # read + one write (the fusion's whole point: no intermediate HBM)
         2.0 * ch * n * chain.fir_taps + 2.0 * ch * n_rs * taps_pp,
         f32 * ch * (n + n_rs)),
        ("stft_power_2048", lambda v: chain.stft_plan.power(v), y2,
         # r2c FFT min flops 2.5 N log2 N per frame + window + |.|^2
         ch * frames * (2.5 * chain.nfft * math.log2(chain.nfft)
                        + chain.nfft + 3 * bins),
         f32 * ch * (n_rs + frames * bins)),
        ("stft_mel_fused", lambda v: _mel.mel_energies_stft(
            v, chain.nfft, chain.hop, chain.n_mels,
            chain.sample_rate * chain.up / chain.down,
            window=chain.window, algorithm=chain.stft_algorithm), y2,
         # the chain's actual STFT stage (Stockham Pallas kernel): FFT min
         # flops + mel projection, and only the signal read + mel write in
         # HBM (no frames/spectrum/power arrays)
         ch * frames * (2.5 * chain.nfft * math.log2(chain.nfft)
                        + chain.nfft + 3 * bins
                        + 2.0 * bins * chain.n_mels),
         f32 * ch * (n_rs + frames * chain.n_mels)),
        ("mel_mfcc", lambda v: _mel.mfcc(
            v, chain.nfft, chain.n_mels, chain.n_mfcc,
            chain.sample_rate * chain.up / chain.down), pw,
         2.0 * ch * frames * (bins * chain.n_mels
                              + chain.n_mels * chain.n_mfcc),
         f32 * ch * frames * (bins + chain.n_mfcc)),
        ("full_chain", chain, x,
         None, None),  # filled below: sum of stages
    ]
    # full-chain minimum counts each math stage once (fused row duplicates
    # the fir+resample work, so sum the staged rows only)
    stages[-1] = ("full_chain", chain, x,
                  sum(s[3] for s in stages[:-1]
                      if s[0] not in ("fir_resample_fused",
                                      "stft_mel_fused")),
                  f32 * ch * (2 * n + frames * chain.n_mfcc))

    floor_ms = scalar_floor() * 1e3
    print(f"per-iter overhead (scalar loop) at ITERS={ITERS}: "
          f"{floor_ms:.3f} ms")
    results = []
    for name, fn, inp, flops, bytes_ in stages:
        def step(v, acc, fn=fn):
            # consume the FULL output: sliced consumption lets XLA's
            # simplifier skip work back through the dots (see PERFORMANCE.md)
            out = fn(v + acc * 1e-30)
            return (jnp.sum(jnp.real(out)) + (jnp.sum(jnp.imag(out))
                    if jnp.iscomplexobj(out) else 0.0)
                    ).astype(jnp.float32) * 1e-30

        dt = chain_time(step, inp)
        ms = dt * 1e3
        dev_ms = max(ms - floor_ms, 1e-6)   # device-side estimate
        sol_ms, bound = roofline_ms(flops, bytes_)
        results.append({
            "stage": name,
            "measured_ms": round(ms, 3),
            "device_ms": round(dev_ms, 3),
            "roofline_ms": round(sol_ms, 4),
            "bound": bound,
            "achieved_fraction": round(sol_ms / ms, 4),
            "achieved_fraction_device": round(sol_ms / dev_ms, 4),
            "min_gflops": round(flops / 1e9, 2),
            "min_mbytes": round(bytes_ / 1e6, 1),
        })
        print(f"{name:18s} {ms:7.2f} ms (dev {dev_ms:6.2f})  "
              f"SoL {sol_ms:6.3f} ms ({bound})  "
              f"achieved {sol_ms/dev_ms*100:5.1f}% of device time",
              flush=True)

    full = next(r for r in results if r["stage"] == "full_chain")
    msps = ch * n / (full["measured_ms"] / 1e3) / 1e6
    print(f"chain throughput: {msps:.0f} Msps input-rate")

    artifact = {
        "device": str(jax.devices()[0]),
        "channels": ch,
        "signal_samples": n,
        "peak_tflops_measured_f32": MEASURED_PEAK_TFLOPS,
        "hbm_gbps_spec": HBM_GBPS,
        "iters": ITERS,
        "overhead_ms_per_iter": round(floor_ms, 4),
        "chain_msps": round(msps, 1),
        "stages": results,
        "notes": "roofline uses ALGORITHMIC minimum flops/bytes (e.g. "
                 "2*taps/sample FIR, 2.5*N*log2(N) r2c FFT), not the "
                 "implementation's; measured_ms includes the amortized "
                 "per-call tunnel dispatch (overhead_ms_per_iter, a "
                 "scalar-only loop's cost), device_ms subtracts it; the "
                 "fused head and STFT rows run the chain's default bf16x3 "
                 "dot tier (see models/pipeline.py).",
    }
    out = os.path.join(REPO, "benchmarks", "roofline_northstar.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
