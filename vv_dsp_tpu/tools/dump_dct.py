"""DCT dump (parity with tools/dump_dct.c): DCT-II/III/IV fwd/inv with the
reference's scaling (fwd unscaled, inverse x2/N; src/spectral/dct.c:18-68).
Default input without --infile is i % 7."""

from __future__ import annotations

import sys

import numpy as np

from vv_dsp_tpu.tools import _cli

USAGE = "Usage: dump_dct --type 2|3|4 --dir fwd|inv -n N [--infile path]"

SPEC = {"--type": ("type", int), "--dir": ("dir", str), "-n": ("n", int),
        "--infile": ("infile", str)}


def main(argv=None) -> int:
    args = _cli.parse_flags(sys.argv[1:] if argv is None else argv, SPEC, USAGE)
    if args is None:
        return 2
    typ = args.get("type", 2)
    n = args.get("n", 8)
    inverse = args.get("dir", "fwd") != "fwd"
    if typ not in (2, 3, 4):
        sys.stderr.write(USAGE + "\n")
        return 2
    _cli.force_cpu()
    import jax.numpy as jnp
    from vv_dsp_tpu.ops import dct

    infile = args.get("infile")
    if infile:
        x = _cli.read_reals(infile, n)
    else:
        x = (np.arange(n) % 7).astype(np.float32)
    y = dct.dct(jnp.asarray(x), type=typ, inverse=inverse)
    _cli.print_reals(np.asarray(y))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
