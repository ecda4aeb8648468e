"""Pallas TPU kernels for the hot loops.

The reference flags its per-sample gather loops as the critical paths
(windowed-sinc resample 0.5-2.1 Msps, FIR direct conv; docs/
simd_optimization_analysis.md:64-73) and projects 8-16x from SIMD. On TPU the
XLA paths in ops.fir / ops.resample are already MXU matmuls; these kernels
attack the remaining HBM-bandwidth waste:

- fir_apply_pallas: causal FIR as a shift-and-accumulate over a VMEM tile
  with the taps-1 halo DMA'd once per tile — reads n + taps-1 samples and
  writes n, vs the im2col/FFT paths' multiple passes. VPU-bound at `taps`
  FMAs per sample.
- resample_poly_pallas: true polyphase — per output tile, DMA the input
  span once, then per-phase strided correlations (static unroll over
  up x taps_pp weights). Avoids materializing the (n_out, taps_pp) gather
  matrix in HBM that the dense einsum path uses (~taps_pp x HBM-traffic
  reduction).

Both kernels auto-interpret off-TPU so the CPU test mesh exercises the same
code path, and both are numerically identical to their ops.* counterparts
(asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vv_dsp_tpu.ops import resample as _resample


def _kernel_precision():
    """Mosaic dots accept only HIGHEST and DEFAULT; map the runtime
    matmul-precision knob (config.set_matmul_precision): highest/high ->
    HIGHEST (full f32 accumulation), default -> DEFAULT (bf16 passes, the
    sanctioned speed-for-accuracy trade).  Kernels that implement the HIGH
    tier natively use dot_algorithm()/dot_alg() instead."""
    from vv_dsp_tpu import config as _c
    return (jax.lax.Precision.DEFAULT
            if _c.MATMUL_PRECISION == jax.lax.Precision.DEFAULT
            else jax.lax.Precision.HIGHEST)


def dot_algorithm(algorithm: str | None = None) -> str:
    """Resolve a dot algorithm name for Pallas kernels: explicit override,
    else map the runtime matmul-precision knob: highest -> "f32" (6-pass
    full f32 accumulation), high -> "bf16x3" (error-compensated 3-pass
    bf16 — the real meaning of lax.Precision.HIGH on TPU, which Mosaic
    dots can't express directly), default -> "bf16" (single pass)."""
    if algorithm is not None:
        if algorithm not in ("f32", "bf16x3", "bf16"):
            raise ValueError("algorithm must be f32 | bf16x3 | bf16")
        return algorithm
    from vv_dsp_tpu import config as _c
    if _c.MATMUL_PRECISION == jax.lax.Precision.DEFAULT:
        return "bf16"
    if _c.MATMUL_PRECISION == jax.lax.Precision.HIGH:
        return "bf16x3"
    return "f32"


def dot_alg(w, x, algorithm: str):
    """In-kernel dot with an explicit algorithm (see dot_algorithm).
    bf16x3: hi/lo split of BOTH operands, drop the lo*lo term — measured
    ~8e-6 max rel err vs float64 at 1024-term contractions, ~1.9x the
    6-pass f32 throughput."""
    import jax.numpy as jnp
    if algorithm == "f32":
        return jnp.dot(w, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if algorithm == "bf16x3":
        w_hi = w.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(w_hi, x_hi, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(w_hi, x_lo, preferred_element_type=jnp.float32)
        return acc + jnp.dot(w_lo, x_hi, preferred_element_type=jnp.float32)
    return jnp.dot(w.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# FIR
# ---------------------------------------------------------------------------

def _fir_kernel(x_hbm, h_ref, y_ref, x_vmem, sem, *, taps, block_t, c_tile,
                win):
    """One (channel-tile, time-tile) grid step: DMA [t*B - (taps-1), (t+1)*B)
    of the padded input into VMEM, accumulate taps shifted products."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    # x_hbm is the FULL padded array in HBM (TPU lowering requires trivial
    # blocking for ANY-space operands); both channel tile and time window are
    # selected by the DMA. Left pad of taps-1 zeros means the ext window for
    # output block t starts at element t*B.
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * c_tile, c_tile), pl.ds(t * block_t, win)],
        x_vmem, sem)
    dma.start()
    dma.wait()
    ext = x_vmem[:]
    acc = jnp.zeros((c_tile, block_t), dtype=ext.dtype)
    for k in range(taps):
        # h[k] multiplies x[i-k]; ext index (taps-1-k) + i.
        acc = acc + h_ref[0, k] * ext[:, taps - 1 - k : taps - 1 - k + block_t]
    y_ref[:, :] = acc


def fir_apply_pallas(h, x, block_t: int = 2048, interpret: bool | None = None):
    """Causal FIR (lfilter(h, [1], x) semantics) as a Pallas kernel.

    x: (channels, n) float32. Equivalent to ops.fir.fir_apply; fastest for
    small/medium taps where the VPU shift-accumulate beats im2col.
    """
    if interpret is None:
        interpret = not _on_tpu()
    h = jnp.asarray(h, dtype=x.dtype)
    taps = h.shape[-1]
    c, n = x.shape
    c_tile = 8
    # Mosaic keeps every unrolled shifted slice live on the VMEM stack
    # (~taps * c_tile * block_t * 4B), so cap the tile to fit the ~16 MB
    # VMEM budget; past ~256 taps use ops.fir.fir_apply_os instead (the FFT
    # path wins there anyway).
    vmem_cap = 8 * 1024 * 1024
    block_cap = vmem_cap // (max(taps, 1) * c_tile * 4) // 128 * 128
    if block_cap < 128:
        raise ValueError(
            f"taps={taps} too large for the Pallas direct kernel; use "
            "fir_apply_os (FFT overlap-save) which is faster at this size")
    block_t = max(128, min(block_t, block_cap, _round_up(n, 128)))
    cp = _round_up(c, c_tile)
    np_ = _round_up(n, block_t)
    # Mosaic DMA windows must be lane-aligned (multiples of 128): the VMEM
    # landing buffer is block_t + taps - 1 rounded up, and the padded input
    # must cover the last tile's (aligned) window.
    win = _round_up(block_t + taps - 1, 128)
    right_pad = (np_ - block_t + win) - (n + taps - 1)
    xp = jnp.pad(x, ((0, cp - c), (taps - 1, right_pad)))
    grid = (cp // c_tile, np_ // block_t)

    kernel = functools.partial(_fir_kernel, taps=taps, block_t=block_t,
                               c_tile=c_tile, win=win)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, taps), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_tile, block_t), lambda i, t: (i, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, np_), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_tile, win), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, h[None, :])
    return y[:c, :n]


# ---------------------------------------------------------------------------
# polyphase resample
# ---------------------------------------------------------------------------

def _poly_kernel(x_hbm, w_ref, y_hbm, x_vmem, y_vmem, in_sems, out_sems, *,
                 up, down, cp, q_tile, c_tile, q_win, tap_plan):
    """One (channel-tile, output-tile) step over PHASE-DEINTERLEAVED input.

    Layouts are flattened phase-major 2D — Mosaic's slice/tiling rules reject
    3D refs whose middle (phase) dim isn't sublane-aligned:
      x_hbm: (down*cp, nrow), row r*cp + c  holds x[c, m*down + r],
      y_hbm: (up*cp,  n_q),  row p*cp + c  gets  y[c, q*up + p].
    Per tile: `down` input DMAs land phase-stacked in x_vmem rows
    [r*c_tile, (r+1)*c_tile); each of the `up` output phases accumulates its
    contiguous tap slices and DMAs out. tap_plan[p] = (w_row,
    [(i, r, off), ...]) with off precomputed so every read is
    ext[r-rows, off : off + q_tile].
    """
    ci = pl.program_id(0)
    t = pl.program_id(1)
    for r in range(down):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(r * cp + ci * c_tile, c_tile),
                     pl.ds(t * q_tile, q_win)],
            x_vmem.at[pl.ds(r * c_tile, c_tile), :],
            in_sems.at[r]).start()
    for r in range(down):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(r * cp + ci * c_tile, c_tile),
                     pl.ds(t * q_tile, q_win)],
            x_vmem.at[pl.ds(r * c_tile, c_tile), :],
            in_sems.at[r]).wait()
    ext = x_vmem[:]
    for p, (w_row, taps) in enumerate(tap_plan):
        slot = p % 2
        if p >= 2:
            # slot reused: previous out-DMA from it must have landed
            pltpu.make_async_copy(
                y_vmem.at[slot],
                y_hbm.at[pl.ds((p - 2) * cp + ci * c_tile, c_tile),
                         pl.ds(t * q_tile, q_tile)],
                out_sems.at[slot]).wait()
        acc = jnp.zeros((c_tile, q_tile), dtype=ext.dtype)
        for i, r, off in taps:
            acc = acc + w_ref[w_row, i] * \
                ext[r * c_tile : (r + 1) * c_tile, off : off + q_tile]
        y_vmem[slot] = acc
        pltpu.make_async_copy(
            y_vmem.at[slot],
            y_hbm.at[pl.ds(p * cp + ci * c_tile, c_tile),
                     pl.ds(t * q_tile, q_tile)],
            out_sems.at[slot]).start()
    for p in range(max(0, up - 2), up):
        slot = p % 2
        pltpu.make_async_copy(
            y_vmem.at[slot],
            y_hbm.at[pl.ds(p * cp + ci * c_tile, c_tile),
                     pl.ds(t * q_tile, q_tile)],
            out_sems.at[slot]).wait()


def resample_poly_pallas(x, up: int, down: int, q_tile: int = 512,
                         interpret: bool | None = None):
    """scipy.signal.resample_poly parity as a Pallas kernel.

    x: (channels, n). Identical output to ops.resample.resample_poly (which
    itself matches scipy). Falls back to the XLA dense path when the static
    unroll (up * taps_pp slices) would blow compile time / VMEM — large `up`
    ratios belong on the MXU einsum anyway.
    """
    if interpret is None:
        interpret = not _on_tpu()
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x
    c, n = x.shape
    n_out = -(-n * up // down)

    h = _resample._resample_poly_filter(up, down)
    half_len = (len(h) - 1) // 2
    h_pad = np.zeros((-(-len(h) // up)) * up)
    h_pad[: len(h)] = h
    taps_pp = len(h_pad) // up
    if up * taps_pp > 512:
        return _resample.resample_poly(x, up, down)
    hpp = jnp.asarray(h_pad.reshape(taps_pp, up).T, dtype=x.dtype)

    c_tile = 8
    q_tile = _round_up(q_tile, 128)  # keeps DMA starts/extents lane-aligned
    # Cap the tile so the unrolled slices fit the VMEM stack (see FIR note).
    # With up*taps_pp <= 512 (checked above) the cap is always >= 512.
    cap = 8 * 1024 * 1024 // (up * taps_pp * c_tile * 4) // 128 * 128
    q_tile = min(q_tile, cap)

    # Static tap plan: output (q, p) of tile t reads
    #   x[(t*q_tile + q)*down + c_p - i],  c_p = (half_len + p*down)//up,
    # and x[m*down + r] lives at deinterleaved row r, column m. Decompose
    # c_p - i = m_off*down + r with 0 <= r < down: column = q + m_off.
    offs = []
    tap_plan = []
    for p in range(up):
        tpos = half_len + p * down
        c_p = tpos // up
        taps = []
        for i in range(taps_pp):
            d = c_p - i
            m_off = d // down  # floor
            r = d - m_off * down
            taps.append((i, r, m_off))
            offs.append(m_off)
        tap_plan.append((tpos % up, taps))
    lo, hi = min(offs), max(offs)
    lpad = max(0, -lo)
    # Shift all column offsets by lpad (the left zero-padding of each row).
    tap_plan = [(w_row, [(i, r, off + lpad) for i, r, off in taps])
                for w_row, taps in tap_plan]

    n_out_pad = _round_up(max(n_out, q_tile * up), q_tile * up)
    n_tiles = n_out_pad // (q_tile * up)
    q_win = _round_up(q_tile + hi + lpad, 128)

    # Deinterleave by input phase, flattened phase-major (down*cp, nrow):
    # row r*cp + c = x[c, r::down], left-padded by lpad zeros, right-padded
    # so every tile's [t*q_tile, t*q_tile + q_win) window is in range.
    nrow_data = -(-n // down)
    nrow = max((n_tiles - 1) * q_tile + q_win - lpad, nrow_data)
    cp = _round_up(c, c_tile)
    xp = jnp.pad(x, ((0, cp - c), (0, nrow * down - n)))
    xd = xp.reshape(cp, nrow, down).transpose(2, 0, 1).reshape(
        down * cp, nrow)
    xd = jnp.pad(xd, ((0, 0), (lpad, 0)))

    kernel = functools.partial(_poly_kernel, up=up, down=down, cp=cp,
                               q_tile=q_tile, c_tile=c_tile, q_win=q_win,
                               tap_plan=tuple(tap_plan))
    y = pl.pallas_call(
        kernel,
        grid=(cp // c_tile, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((up, taps_pp), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((up * cp, n_out_pad // up), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((down * c_tile, q_win), x.dtype),
            pltpu.VMEM((2, c_tile, q_tile), x.dtype),
            pltpu.SemaphoreType.DMA((down,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xd, hpp)
    # phase-major (up, cp, Q) -> interleaved (cp, Q*up)
    y = y.reshape(up, cp, n_out_pad // up).transpose(1, 2, 0).reshape(
        cp, n_out_pad)
    return y[:c, :n_out]


# ---------------------------------------------------------------------------
# fused STFT power
# ---------------------------------------------------------------------------

def _stft_power_kernel(x_hbm, bre_ref, bim_ref, y_ref, x_vmem, sem, *,
                       q, hop, tk, bt, rows):
    """One (channel, bin-tile, frame-tile) step: DMA `rows` hop-blocks of
    the signal, then accumulate q shifted (tk, hop) @ (hop, BT) dots for the
    re and im parts and write |.|^2. Frames never exist in HBM OR VMEM —
    frame k's window is rows k..k+q-1 of the hop-blocked signal."""
    c = pl.program_id(0)
    f = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(f * tk, rows), :], x_vmem, sem)
    dma.start()
    dma.wait()
    acc_re = jnp.zeros((tk, bt), jnp.float32)
    acc_im = jnp.zeros((tk, bt), jnp.float32)
    for r in range(q):
        seg = x_vmem[r: r + tk, :]
        acc_re = acc_re + jnp.dot(
            seg, bre_ref[r * hop: (r + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=_kernel_precision())
        acc_im = acc_im + jnp.dot(
            seg, bim_ref[r * hop: (r + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=_kernel_precision())
    y_ref[0, :, :] = acc_re * acc_re + acc_im * acc_im


def stft_power_pallas(x, nfft: int, hop: int, window: str = "hann",
                      window_param=None, n_frames: int | None = None,
                      interpret: bool | None = None):
    """|rfft(w * frame)|^2 spectrogram in ONE fused kernel: the window is
    folded into the r2c basis, the signal is viewed as hop-blocks, and each
    (frame-tile, bin-tile) is a chain of q = nfft/hop MXU dots accumulated
    in VMEM — no frames array, no complex spectrum, one read of x per bin
    tile and one write of the power.

    x: (channels, n) f32; requires hop | nfft and 128 | hop. Numerically
    identical to STFT(nfft, hop, window).power (asserted in tests).
    """
    from vv_dsp_tpu.ops.stft import _windowed_rfft_basis

    if interpret is None:
        interpret = not _on_tpu()
    if nfft % hop or hop % 128:
        raise ValueError("stft_power_pallas needs hop | nfft and 128 | hop")
    c, n = x.shape
    q = nfft // hop
    bins = nfft // 2 + 1
    if n_frames is None:
        n_frames = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    bre, bim = _windowed_rfft_basis(nfft, window, window_param,
                                    np.dtype(x.dtype).name)
    # pad bins to the lane quantum; extra columns are zero -> zero power
    # (bt sized so the two double-buffered (nfft, bt) basis blocks + the
    # dot stack fit the 16 MB scoped-vmem budget)
    bt = 128 if nfft > 2048 else 256
    bins_p = _round_up(bins, bt)
    bz = np.zeros((nfft, bins_p - bins), dtype=bre.dtype)
    breh = jnp.asarray(np.concatenate([bre, bz], 1))
    bimh = jnp.asarray(np.concatenate([bim, bz], 1))

    tk = min(256, _round_up(n_frames, 8))
    nf_p = _round_up(n_frames, tk)
    rows = _round_up(tk + q - 1, 8)
    # hop-blocked signal covering every DMA window: (c, nb, hop)
    nb = nf_p - tk + rows
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xb = xp.reshape(c, nb, hop)

    kernel = functools.partial(_stft_power_kernel, q=q, hop=hop, tk=tk,
                               bt=bt, rows=rows)
    y = pl.pallas_call(
        kernel,
        grid=(c, bins_p // bt, nf_p // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nfft, bt), lambda c, b, f: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, bt), lambda c, b, f: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tk, bt), lambda c, b, f: (c, f, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nf_p, bins_p), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, hop), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xb, breh, bimh)
    return y[:, :n_frames, :bins]


# ---------------------------------------------------------------------------
# best-path dispatch
# ---------------------------------------------------------------------------

def fir_apply_best(h, x):
    """Fastest FIR path for the current backend (chained-timing on TPU v5e,
    16ch x 480k f32): Pallas direct wins only for tiny taps (<=16: 1505
    Msps); the banded-matmul kernel wins for large taps (1024: 3.6 vs 4.6
    ms for block-Toeplitz); the block-Toeplitz MXU matmul form covers the
    middle (~1100-1500 Msps vs 74-697 for conv/overlap-save)."""
    from vv_dsp_tpu.ops import fir as _fir
    from vv_dsp_tpu.utils.kernel_grad import kernel_with_xla_vjp
    taps = jnp.shape(h)[-1]
    if _on_tpu() and x.ndim != 2:
        from vv_dsp_tpu.utils.shapes import collapse_leading
        x2, restore = collapse_leading(x)
        return restore(fir_apply_best(h, x2), 1)
    if _on_tpu():
        if x.ndim == 2 and taps <= 16:
            # backward differentiates the XLA direct form (incl. d/dh)
            return kernel_with_xla_vjp(fir_apply_pallas, _fir.fir_apply)(h, x)
        if (x.ndim == 2 and taps >= 512
                and not isinstance(h, jax.core.Tracer)):
            # traced taps (learned coefficients under jit) stay on the
            # fir_apply_mxu path, which supports them
            from vv_dsp_tpu.ops import pallas_upfirdn as _pu
            h_np = np.asarray(h, np.float64)
            if _pu.banded_supported(1, 1, len(h_np), 0):
                return kernel_with_xla_vjp(
                    lambda xv: _pu.upfirdn_banded_pallas(
                        xv, h_np, 1, 1, 0, xv.shape[-1]).astype(xv.dtype),
                    lambda xv: _fir.fir_apply_mxu(h_np.astype(xv.dtype), xv),
                )(x)
        return _fir.fir_apply_mxu(h, x)
    if taps <= 64:
        return _fir.fir_apply(h, x)
    return _fir.fir_apply_os(h, x)


def resample_poly_best(x, up: int, down: int):
    """Fastest polyphase path (chained-timing, v5e, 16ch x 480k f32):

    - small `up` (the 4/3, 2/1, 1/2 class): Pallas kernel, 0.9-1.3 Gsps —
      never materializes the (n_out, taps_pp) gather in HBM,
    - large `up` (160/147 class): resample_poly_mxu frames-matmul/conv,
      ~2.1 Gsps — the wide phase dim fills MXU tiles where the Pallas
      unroll (up*taps_pp weights) blows VMEM and the gather path crawls
      (63 Msps),
    - off-TPU: MXU conv form (pure XLA, composes everywhere).

    All three are sample-exact vs scipy.signal.resample_poly.
    """
    g = math.gcd(up, down)
    up_r, down_r = up // g, down // g
    if up_r == 1 and down_r == 1:
        return x
    if _on_tpu() and x.ndim != 2:
        from vv_dsp_tpu.utils.shapes import collapse_leading
        x2, restore = collapse_leading(x)
        return restore(resample_poly_best(x2, up, down), 1)
    if _on_tpu() and x.ndim == 2 and up_r < 32:
        # banded-matmul kernel: 3.4 ms vs 6.9 (per-phase Pallas) / 12.1
        # (frames-matmul) for 4/3 at 16ch x 479k (ops/pallas_upfirdn.py);
        # backward via the frames-matmul XLA path
        from vv_dsp_tpu.ops import pallas_upfirdn as _pu
        from vv_dsp_tpu.utils.kernel_grad import kernel_with_xla_vjp
        h = _resample._resample_poly_filter(up_r, down_r)
        off = (len(h) - 1) // 2
        if _pu.banded_supported(up_r, down_r, len(h), off):
            n_out = -(-x.shape[-1] * up_r // down_r)
            return kernel_with_xla_vjp(
                lambda xv: _pu.upfirdn_banded_pallas(xv, h, up_r, down_r,
                                                     off, n_out),
                lambda xv: _resample.resample_poly_mxu(xv, up_r, down_r),
            )(x)
    return _resample.resample_poly_mxu(x, up_r, down_r)
