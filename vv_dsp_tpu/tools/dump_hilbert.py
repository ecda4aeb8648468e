"""Hilbert dump (parity with tools/dump_hilbert.c): generates
sin(2*pi*f0*t/fs + phase), prints the analytic signal 're,im' per line plus
an avg_ifreq sanity line on stderr."""

from __future__ import annotations

import math
import sys

import numpy as np

from vv_dsp_tpu.tools import _cli

USAGE = "Usage: dump_hilbert -n N --fs FS --f F0 --phase PHASE"

SPEC = {"-n": ("n", int), "--fs": ("fs", float), "--f": ("f0", float),
        "--phase": ("phase", float)}


def main(argv=None) -> int:
    args = _cli.parse_flags(sys.argv[1:] if argv is None else argv, SPEC, USAGE)
    if args is None:
        return 2
    n = args.get("n", 256)
    fs = args.get("fs", 1000.0)
    f0 = args.get("f0", 123.0)
    ph = args.get("phase", 0.0)
    _cli.force_cpu()
    import jax.numpy as jnp
    from vv_dsp_tpu.ops import hilbert

    t = np.arange(n, dtype=np.float64)
    x = jnp.asarray(np.sin(2.0 * math.pi * f0 * t / fs + ph), dtype=jnp.float32)
    xa = hilbert.hilbert_analytic(x)
    phi = hilbert.instantaneous_phase(xa)
    freq = hilbert.instantaneous_frequency(phi, fs)
    avg = float(np.mean(np.asarray(freq)[1:]))
    sys.stderr.write("avg_ifreq=%g Hz manual=%g\n" % (avg, avg))
    _cli.print_complex(np.asarray(xa))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
