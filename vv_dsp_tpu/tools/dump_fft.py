"""FFT dump tool (parity with tools/dump_fft.c:11-98): c2c/r2c/c2r x fwd/inv
on text fixtures, '%g,%g' / '%g' stdout."""

from __future__ import annotations

import sys

import numpy as np

from vv_dsp_tpu.tools import _cli

USAGE = "Usage: dump_fft --type c2c|r2c|c2r --dir fwd|inv -n N --seed S [--infile PATH]"

SPEC = {
    "-n": ("n", int), "--type": ("type", str), "--dir": ("dir", str),
    "--seed": ("seed", int), "--infile": ("infile", str),
}


def main(argv=None) -> int:
    args = _cli.parse_flags(sys.argv[1:] if argv is None else argv, SPEC, USAGE)
    if args is None:
        return 2
    n = args.get("n", 16)
    typ = args.get("type", "c2c")
    fwd = args.get("dir", "fwd") == "fwd"
    seed = args.get("seed", 0)
    infile = args.get("infile")
    if typ not in ("c2c", "r2c", "c2r"):
        sys.stderr.write(USAGE + "\n")
        return 2

    _cli.force_cpu()
    import jax.numpy as jnp
    from vv_dsp_tpu.ops import fft as F

    if typ == "c2c":
        x = (_cli.read_complex(infile, n) if infile else _cli.rand_complex(n, seed))
        out = F.fft(jnp.asarray(x)) if fwd else F.ifft(jnp.asarray(x))
        _cli.print_complex(np.asarray(out))
    elif typ == "r2c":
        x = (_cli.read_reals(infile, n) if infile else
             _cli.rand_reals(n, seed, 0.0, 1.0))
        out = F.rfft(jnp.asarray(x))
        _cli.print_complex(np.asarray(out))
    else:  # c2r: m = n//2+1 bins in, n reals out (inverse, 1/n scaled)
        m = n // 2 + 1
        x = (_cli.read_complex(infile, m) if infile else _cli.rand_complex(m, seed))
        out = F.irfft(jnp.asarray(x), n)
        _cli.print_reals(np.asarray(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
