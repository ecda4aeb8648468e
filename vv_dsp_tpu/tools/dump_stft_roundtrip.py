"""STFT->ISTFT roundtrip dump (parity with tools/dump_stft_roundtrip.c):
frames iterate only while f*hop+fft <= n (no zero-padded tail), OLA with w^2
norm, per-sample y = recon/norm if norm > 1e-12 else 0, exactly n lines."""

from __future__ import annotations

import sys

import numpy as np

from vv_dsp_tpu.tools import _cli

USAGE = ("Usage: dump_stft_roundtrip --fft N --hop H --win hann|hamming|boxcar"
         " --n SAMPLES [--infile PATH] [--seed SEED]")

SPEC = {"--fft": ("fft", int), "--hop": ("hop", int), "--win": ("win", str),
        "--n": ("n", int), "--seed": ("seed", int), "--infile": ("infile", str)}


def main(argv=None) -> int:
    args = _cli.parse_flags(sys.argv[1:] if argv is None else argv, SPEC, USAGE)
    if args is None:
        return 2
    nfft = args.get("fft", 256)
    hop = args.get("hop", 128)
    win = args.get("win", "hann")
    n = args.get("n", 2048)
    if win not in ("hann", "hamming", "boxcar"):
        sys.stderr.write(USAGE + "\n")
        return 2
    infile = args.get("infile")
    _cli.force_cpu()
    import jax.numpy as jnp

    from vv_dsp_tpu.ops import fft as _offt
    from vv_dsp_tpu.ops import framing
    from vv_dsp_tpu.ops.window import get_window

    x = (_cli.read_reals(infile, n) if infile
         else _cli.rand_reals(n, args.get("seed", 0)))
    sig = jnp.asarray(x)
    w = get_window(win, nfft)
    nf = 0 if n < nfft else (n - nfft) // hop + 1  # f*hop+fft <= n
    idx = (jnp.arange(nf)[:, None] * hop + jnp.arange(nfft)[None, :])
    frames = jnp.take(sig, idx, axis=-1) * w
    spec = _offt.fft(frames)  # fwd C2C like the reference STFT
    time = _offt.ifft(spec).real * w
    recon = framing.overlap_add(time, hop, n)
    norm = framing.overlap_add(jnp.broadcast_to(w * w, (nf, nfft)), hop, n)
    y = jnp.where(norm > 1e-12, recon / jnp.where(norm > 1e-12, norm, 1.0), 0.0)
    _cli.print_reals(np.asarray(y))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
