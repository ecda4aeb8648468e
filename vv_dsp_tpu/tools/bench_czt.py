"""CZT micro-bench (parity with tools/bench_czt.c): `bench_czt [N [M [iters]]]`,
prints average ms and the peak output bin of a bin-centered tone."""

from __future__ import annotations

import math
import sys
import time

import numpy as np

from vv_dsp_tpu.tools import _cli


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if len(argv) > 0 else 1024
    m = int(argv[1]) if len(argv) > 1 else 1024
    iters = int(argv[2]) if len(argv) > 2 else 10

    _cli.force_cpu()
    import jax
    import jax.numpy as jnp
    from vv_dsp_tpu.ops import czt as czt_mod

    t = np.arange(n, dtype=np.float64)
    x = jnp.asarray(np.sin(2 * math.pi * 37.0 * t / n), dtype=jnp.float32)
    w = complex(math.cos(-2 * math.pi / m), math.sin(-2 * math.pi / m))
    fn = jax.jit(lambda v: czt_mod.czt(v, m, w, 1.0 + 0.0j))
    out = fn(x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x).block_until_ready()
    avg_ms = (time.perf_counter() - t0) / iters * 1e3
    print("CZT bench: N=%d M=%d iters=%d avg=%.3f ms" % (n, m, iters, avg_ms))
    mag = np.abs(np.asarray(out))
    print("Peak bin: %d" % int(np.argmax(mag)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
