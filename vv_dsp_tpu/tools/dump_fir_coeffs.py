"""FIR coefficient dump (parity with tools/dump_fir_coeffs.c)."""

from __future__ import annotations

import sys

import numpy as np

from vv_dsp_tpu.tools import _cli
from vv_dsp_tpu.tools.dump_fir import WIN_MAP

USAGE = "Usage: dump_fir_coeffs --num-taps N --cutoff C --win hann|hamming|boxcar|blackman"

SPEC = {"--num-taps": ("taps", int), "--cutoff": ("cutoff", float),
        "--win": ("win", str)}


def main(argv=None) -> int:
    args = _cli.parse_flags(sys.argv[1:] if argv is None else argv, SPEC, USAGE)
    if args is None:
        return 2
    win = WIN_MAP.get(args.get("win", "hamming"))
    if win is None:
        sys.stderr.write(USAGE + "\n")
        return 2
    _cli.force_cpu()
    from vv_dsp_tpu.ops import fir

    h = fir.design_lowpass(args.get("taps", 31), args.get("cutoff", 0.25), win)
    _cli.print_reals(np.asarray(h))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
