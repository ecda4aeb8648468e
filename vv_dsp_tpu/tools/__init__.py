"""CLI dump tools — flag/stdout parity with the reference's tools/*.c so the
reference's own Python validators (python/test_*.py) can drive this framework
by swapping the binary path for ``python -m vv_dsp_tpu.tools.dump_<op>``.

Each module exposes ``main(argv) -> int`` and is runnable with ``-m``. Output
formats follow the originals exactly: one value per line, '%g' (complex as
're,im'); deviations are noted per tool. Random inputs use numpy's PCG
instead of C rand() — validators always pass --infile fixtures, so parity is
unaffected.
"""

TOOLS = [
    "dump_fft", "dump_fir", "dump_fir_coeffs", "dump_iir",
    "dump_stft_roundtrip", "dump_resample", "dump_czt", "dump_dct",
    "dump_stats", "dump_hilbert", "dump_mfcc", "bench_czt",
]
