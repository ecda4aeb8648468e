"""Streaming end-to-end pipeline: the NorthStarChain as a block-at-a-time
stream with carried, checkpointable state.

Composes the streaming primitives (FIR history, polyphase latency buffer,
STFT analysis tail) into one `(state, block) -> (features, state)` function —
the production serving shape: feed fixed-size audio blocks, get fixed-size
MFCC frame batches, snapshot/restore the state pytree at any block boundary
(utils.checkpoint). Matches the offline chain on the overlapping frame set.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp

from vv_dsp_tpu import streaming
from vv_dsp_tpu.ops import fir as _fir
from vv_dsp_tpu.ops import mel as _mel
from vv_dsp_tpu.ops.fft import rfft_power


@dataclasses.dataclass(frozen=True)
class StreamingNorthStar:
    """Block-streaming FIR -> polyphase resample -> STFT -> log-mel -> MFCC.

    block_in must be a multiple of down * hop * down... precisely: the
    resampler needs block_in % down == 0 and the STFT needs the resampled
    block (block_in * up / down) % hop == 0.
    """

    fir_taps: int = 1024
    fir_cutoff: float = 0.45
    up: int = 4
    down: int = 3
    nfft: int = 2048
    hop: int = 512
    n_mels: int = 80
    n_mfcc: int = 20
    sample_rate: float = 48000.0
    window: str = "hann"

    @functools.cached_property
    def fir_coeffs(self):
        return _fir.design_lowpass(self.fir_taps, self.fir_cutoff)

    @functools.cached_property
    def _resampler(self):
        return streaming.ResamplePolyStream(self.up, self.down)

    @functools.cached_property
    def _stft(self):
        return streaming.StftStream(self.nfft, self.hop, self.window)

    def validate_block(self, block_in: int) -> int:
        """Frames emitted per block; raises if the geometry doesn't tile."""
        if block_in % self.down:
            raise ValueError("block must be a multiple of `down`")
        out = block_in * self.up // self.down
        if out % self.hop:
            raise ValueError(
                "resampled block length must be a multiple of hop "
                f"(got {out} % {self.hop})")
        return out // self.hop

    def init(self, batch_shape=(), dtype=jnp.float32):
        return {
            "fir": streaming.fir_stream_init(self.fir_coeffs, batch_shape,
                                             dtype),
            "resample": self._resampler.init(batch_shape, dtype),
            "stft": self._stft.analysis_init(batch_shape, dtype),
        }

    def process(self, state, block):
        """(state, (..., block_in)) -> ((..., frames, n_mfcc), state)."""
        self.validate_block(block.shape[-1])
        y, fir_s = streaming.fir_stream_process(self.fir_coeffs,
                                                state["fir"], block)
        y, rs_s = self._resampler.process(state["resample"], y)
        # windowed framing via the shared StftStream step (single source of
        # truth for tail-carry semantics, incl. the nfft == hop empty tail),
        # then the fused power spectrum -> MFCC
        frames, stft_s = self._stft.frames(state["stft"], y)
        feats = self._mfcc(frames)
        new_state = {"fir": fir_s, "resample": rs_s, "stft": stft_s}
        return feats, new_state

    def process_blocks(self, state, signal, block_in: int):
        """Chunked streaming: K = signal_len/block_in blocks in ONE device
        dispatch. ((..., K*block_in) signal) -> ((..., K*frames, n_mfcc),
        state). Exactly equal to K sequential `process` calls (lax.scan over
        the same step), but the host dispatch / transfer cost is paid once
        per chunk instead of once per block — the serving shape for
        latency-tolerant batch streaming. State checkpoints remain valid at
        every chunk boundary."""
        self.validate_block(block_in)
        return streaming.scan_stream(
            lambda s, blk: self.process(s, blk), state, signal, block_in,
            out_axis=-2)

    def _mfcc(self, frames):
        power = rfft_power(frames)
        return _mel.mfcc(power, self.nfft, self.n_mels, self.n_mfcc,
                         self.sample_rate * self.up / self.down)

    def flush(self, state):
        """End-of-stream drain -> the final (..., latency_out//hop + 1,
        n_mfcc) feature frames.

        Composes the two pending tails the per-block path cannot emit: the
        resampler's `latency_out` buffered output samples (drained by pushing
        its `delay_in` zeros — exactly the offline resampler's implicit
        zero-extension past the signal end) and the STFT's carried nfft-hop
        analysis tail (completed with zeros like the offline zero-padded tail
        frames, src/spectral/stft.c:124-137). After flush, the total streamed
        output equals the offline chain on the full signal INCLUDING its
        tail frames: streamed[warm:] == offline where warm = nfft/hop - 1
        (derivation: with S streamed samples (S % hop == 0) and L = S +
        latency_out total, offline emits 1 + (L-nfft+hop)//hop frames; the
        deficit after the last block is always floor(lat/hop) + 1 frames =
        feeding lat + hop - lat%hop more samples).
        """
        if self.nfft % self.hop:
            raise ValueError("flush requires nfft % hop == 0")
        y_tail = self._resampler.flush(state["resample"])
        lat = self._resampler.latency_out
        z = self.hop - lat % self.hop
        zeros = jnp.zeros(y_tail.shape[:-1] + (z,), y_tail.dtype)
        feed = jnp.concatenate([y_tail, zeros], axis=-1)
        frames, _ = self._stft.frames(state["stft"], feed)
        return self._mfcc(frames)
