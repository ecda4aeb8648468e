"""Host-side audio I/O (WAV). I/O is host code — arrays land on device only
when an op consumes them."""

from vv_dsp_tpu.io.wav import read_wav, write_wav, wav_info, WavInfo
from vv_dsp_tpu.io.batch import (WavBatch, read_wav_batch, prefetch_batches)
