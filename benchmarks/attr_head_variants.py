"""Dot-algorithm decomposition for the fused FIR+resample banded head:
times the public kernel at flagship geometry under f32 / bf16x3 / bf16 to
separate MXU-pass cost from fixed (DMA, halo rolls, epilogue) cost.

Diagnostic tool, not a committed artifact.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=479232)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from vv_dsp_tpu.ops import fir as _fir
    from vv_dsp_tpu.ops.resample import fir_resample_fused
    from vv_dsp_tpu.utils.profiling import chain_benchmark

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.channels, args.n)),
                    dtype=jnp.float32)
    h = _fir.design_lowpass_np(1024, 0.45).astype(np.float32)

    ref = None
    for alg in ("bf16x3", "f32", "bf16"):
        step = lambda v, acc: jnp.sum(fir_resample_fused(
            h, v + acc * 1e-30, 4, 3, algorithm=alg)
        ).astype(jnp.float32) * 1e-30
        r = chain_benchmark(f"head[{alg}]", step, x,
                            n_samples=args.channels * args.n,
                            iters=args.iters)
        out = fir_resample_fused(h, x, 4, 3, algorithm=alg)
        row = {"variant": alg, "ms": round(r.elapsed_ms, 3)}
        if ref is None:
            ref = out
        else:
            row["max_rel_vs_bf16x3"] = "%.2e" % float(
                jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
