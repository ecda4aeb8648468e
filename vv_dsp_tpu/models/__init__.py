"""End-to-end DSP pipeline models.

The reference has no "models" — its closest notions are the benchmark
pipeline (frame -> window -> FFT -> spectral gate -> IFFT -> OLA,
bench/bench_pipeline.c:77-120) and the MFCC CLI chain (tools/dump_mfcc.c).
Here those become first-class jittable, shardable pipeline objects:

- :class:`NorthStarChain` — the BASELINE.json flagship: 1024-tap FIR ->
  4/3 polyphase resample -> 2048-pt STFT -> log-mel -> MFCC,
- :class:`SpectralGate` — the reference's end-to-end benchmark pipeline
  (STFT -> magnitude gate -> ISTFT),
- :class:`MFCCFrontend` — WAV-to-MFCC feature extractor.

All are precomputed-constant pytrees ("plans") whose __call__ is pure and
jit/shard_map friendly.
"""

from vv_dsp_tpu.models.pipeline import NorthStarChain, SpectralGate, MFCCFrontend
from vv_dsp_tpu.models.streaming_chain import StreamingNorthStar
