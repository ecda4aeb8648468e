"""Fused Stockham-FFT Pallas kernels (the O(N log N) on-chip transform tier).

The reference computes STFT spectra with an O(N log N) radix-2 kernel per
frame (src/spectral/fft_kiss.c:27-74) and builds mel/MFCC features from them
(src/features/mel.c:204-309). The repo's XLA paths compute the same thing as
dense matmul-DFTs — MXU-optimal for their (inflated) O(N^2) FLOPs, but at
nfft=2048 the basis matmul alone runs ~94% of the MXU bf16 peak, i.e. the
dense form is at ITS speed-of-light and still 6.5x more FLOPs than an FFT.

This kernel gets the FFT's FLOP count at TPU speed by splitting the
transform between the two compute units:

- radix-2 DIF butterfly stages run on the VPU while the butterfly half-span
  is large (>= 32 rows): each stage is two elementwise passes over a
  (nfft, 128-frames) VMEM tile — contiguous row chunks, no shuffles. In-place
  DIF needs no bit-reversal pass; bins come out in a fixed permuted row
  order that downstream LINEAR consumers absorb into their own constants.
- the last log2(lstop) stages — whose half-spans would shrink below the
  8-row f32 sublane and force Mosaic relayouts (measured ~4 ms of an 11-stage
  all-butterfly kernel) — are folded into ONE packed-complex DFT-lstop
  matmul per 64-row block on the MXU:  [Or; Oi] = [[Dr,-Di],[Di,Dr]] @
  [Sr; Si], a full-tile (128,128)x(128,tk) dot.

Row -> bin mapping after the tail (verified against np.fft.fft):
    row p = lstop*b + k   holds   bin k*(nfft//lstop) + bitrev(b)
with bitrev over log2(nfft//lstop) bits.

stft_mel_energies_pallas fuses the whole STFT->mel front half of the MFCC
pipeline: hop-blocked signal DMA -> frame tile (time on sublanes, frames on
lanes) -> window -> FFT -> |.|^2 -> mel projection, where the mel matrix is
Hermitian-folded onto all nfft bins and column-permuted by the row->bin map,
so neither the frames array, the spectrum, nor the power ever exist in HBM.
Measured (v5e, 16ch x 639k samples, nfft 2048/hop 512/80 mels): 3.9 ms vs
10.2 ms for the hop-block einsum path, with max|err| vs a float64 oracle of
1.5e-7 x scale (the dense-basis path: 2.8e-7).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vv_dsp_tpu import config


_LSTOP = 64  # butterfly/matmul split point (see module docstring)
_TK = 128    # frames per grid step (lane width)
# NOTE (round 4, measured): raising the spectrum/power kernels' budget to
# 15 MB picks tk=512 at 2048-point geometries and measured -24% on the
# 2048/512 c2c row — but it is NOT SAFE: Mosaic materializes full-tile
# (m, tk) butterfly stack temporaries the byte model can't see, and at
# ~17.5 MB estimated scoped usage some geometries compile while others
# OOM ("exceeded scoped vmem limit"), depending on opaque scheduling —
# (2048, 256) passed where (2048, 512) failed with identical per-tile
# buffers. Within ~1 MB of the 16 MB ceiling, compile success is
# non-deterministic across geometries; a hard compile error in user code
# is worse than 24% on one row, so the budget stays at the 12 MB default
# (tests/test_tpu_hardware.py sweeps the picks on hardware).


def _pick_tk(nf: int, bytes_per_tk: int, fixed_bytes: int = 0,
             budget: int = 12 * 2 ** 20, cap: int = 512) -> int:
    """Frames-per-grid-step: wider tiles amortize per-step latency and feed
    the tail matmuls larger N (measured +10% at tk=512 vs 128 on the
    1024/256 spectrum, +3-4% at 640 vs 512 on the chain's 2048/512 mel
    kernel, v5e), capped by a VMEM budget and by the padded frame count
    (nf_p rounds UP to tk - short signals stay at 128).
    The per-kernel `cap` matters: the packed mel/MFCC kernels (tiny out
    tiles) take 640; the spectrum/power kernels (full (m_pad, tk) out
    tiles, double-buffered) REGRESS ~25% beyond 512; everything regresses
    at 1024 (VMEM pressure kills the pipelining); and 768 — though it
    measured +4% at 2048-point mel inside a fori_loop harness — OOMs
    Mosaic's scoped VMEM when the same call compiles standalone, so
    no kernel requests it beyond the UNPACKED mel kernel at
    nfft <= 512 (hardware-verified clean through 768; its nfft=1024
    geometry needs cap=256 — see _stft_mel_call)."""
    for tk in (768, 640, 512, 384, 256, 128):
        if tk > cap or (tk > 128 and tk > _round_up(max(nf, 1), 128)):
            continue
        if fixed_bytes + tk * bytes_per_tk <= budget:
            return tk
    return 128


def _packed_mel_pick_tk(nf0: int, m: int, hop: int) -> int:
    """The packed mel/MFCC kernels' production tile pick — ONE definition
    shared with the tests so a byte-model change can't silently diverge
    from what the tests validate. Cap 640, not 768: tk=768 at 2048-point
    geometry measured +4% inside a fori_loop harness but OOMs Mosaic's
    scoped VMEM (19.1 MB) when the same call compiles standalone — the
    same context-dependent ceiling behavior as the spectrum kernels (see
    the VMEM note above); 640 is the widest pick proven to compile in
    every context (it is the chain's handoff width, exercised by
    tests/test_tpu_hardware.py)."""
    return _pick_tk(nf0, 4 * (2 * m + 4 * 128 + hop),
                    fixed_bytes=4 * 128 * hop + 2 ** 20, cap=640)


from vv_dsp_tpu.ops.pallas_kernels import (_kernel_precision, _on_tpu,
                                            _round_up,
                                            dot_alg as _dot_alg,
                                            dot_algorithm as _dot_algorithm)


def _bitrev_perm(nb: int) -> np.ndarray:
    """Bit-reversal permutation of range(nb), nb a power of two."""
    bits = nb.bit_length() - 1
    idx = np.arange(nb)
    out = np.zeros(nb, dtype=np.int64)
    for i in range(bits):
        out = (out << 1) | ((idx >> i) & 1)
    return out


def row_to_bin_perm(nfft: int, lstop: int = _LSTOP) -> np.ndarray:
    """bin index held by each output row p of the split-radix pipeline."""
    nb = nfft // lstop
    brv = _bitrev_perm(nb)
    p = np.arange(nfft)
    return (p % lstop) * nb + brv[p // lstop]


@functools.lru_cache(maxsize=32)
def _stage_twiddles(nfft: int, n_stages: int):
    """(n_stages, nfft//2) cos/sin tables; stage s covers span l = nfft>>s."""
    twr = np.zeros((max(n_stages, 1), nfft // 2), np.float32)
    twi = np.zeros((max(n_stages, 1), nfft // 2), np.float32)
    l = nfft
    for s in range(n_stages):
        h = l // 2
        ang = -2.0 * np.pi * np.arange(h) / l
        twr[s, :h] = np.cos(ang)
        twi[s, :h] = np.sin(ang)
        l //= 2
    return twr, twi


@functools.lru_cache(maxsize=4)
def _packed_dft(lstop: int) -> np.ndarray:
    """(2*lstop, 2*lstop) real matrix: [Or; Oi] = Dp @ [Sr; Si]."""
    d = np.exp(-2j * np.pi * np.outer(np.arange(lstop), np.arange(lstop))
               / lstop)
    return np.block([[d.real, -d.imag],
                     [d.imag, d.real]]).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _folded_mel_matrix(nfft: int, n_mels: int, sample_rate: float,
                       fmin: float, fmax: float, variant: str,
                       lstop: int) -> np.ndarray:
    """Mel filterbank extended to all nfft bins via the real-input Hermitian
    power fold (p[k] == p[nfft-k]), then column-permuted to the kernel's row
    order and zero-padded to 128 rows. Matches
    mel_filterbank_np @ onesided-power exactly for real signals."""
    from vv_dsp_tpu.ops import mel as _mel

    fb = _mel.mel_filterbank_np(nfft, n_mels, sample_rate, fmin, fmax,
                                variant).astype(np.float32)
    w2 = np.zeros((n_mels, nfft), np.float32)
    w2[:, : nfft // 2 + 1] = fb
    w2[:, 1 : nfft // 2] *= 0.5
    w2[:, nfft // 2 + 1 :] = w2[:, 1 : nfft // 2][:, ::-1]
    w2p = w2[:, row_to_bin_perm(nfft, lstop)]
    out = np.zeros((_round_up(n_mels, 128), nfft), np.float32)
    out[:n_mels] = w2p
    return out


# ---------------------------------------------------------------------------
# packed-real front half: the nfft-point REAL FFT computed as an m = nfft/2
# complex FFT of Z = x_even + j*x_odd.  Halves the butterfly passes, cuts the
# DFT-lstop tail from 2*(m/lstop... wait, from nfft/lstop to ~1.1*m/lstop
# matmuls, and halves the mel projection — the Hermitian unpack
# X[k] = E[k] + w_k O[k] (E = (Z[k]+conj(Z[m-k]))/2, O = (Z[k]-conj(Z[m-k]))/2j)
# never materializes X: the kernels only need |X|^2, and the PAIRED row
# algebra gives both |X[k]|^2 = |E + wO|^2 and |X[m-k]|^2 = |E - wO|^2 from
# one aligned (Z[k], Z[m-k]) pair.  Row alignment of the pair costs nothing:
# the partner rows come out of the SAME DFT-lstop tail with a row-permuted
# tail matrix (host-side), so pairing is elementwise on the VPU.
# ---------------------------------------------------------------------------

def _brev_val(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


@functools.lru_cache(maxsize=16)
def _packed_pair_plan(m: int, lstop: int):
    """Block pairing of the m-point FFT tail for the Hermitian unpack.

    Returns (selfs, crosses, row_bin):
      selfs   = [(block, kind)] with kind 0 for the r=0 block (partner row
                sigma(j) = (L-j) % L) and 1 for the r=nb/2 block
                (sigma(j) = L-1-j),
      crosses = [(b1, b2)] block pairs with partner rows L-1-j of b2,
      row_bin = int array (m,): the X-bin whose power each STORAGE row holds
                (p1 of compute blocks in natural rows; p2 of a cross pair
                stored at the partner block's rows).
    """
    nb = m // lstop
    bits = nb.bit_length() - 1
    brev = [_brev_val(b, bits) for b in range(nb)]
    inv = {r: b for b, r in enumerate(brev)}
    selfs, crosses = [], []
    row_bin = np.zeros(m, dtype=np.int64)
    seen = set()
    for b1 in range(nb):
        if b1 in seen:
            continue
        r1 = brev[b1]
        k1 = np.arange(lstop) * nb + r1          # bins of b1's natural rows
        if r1 == 0 or (nb > 1 and r1 == nb // 2):
            selfs.append((b1, 0 if r1 == 0 else 1))
            row_bin[b1 * lstop:(b1 + 1) * lstop] = k1
            seen.add(b1)
        else:
            b2 = inv[(nb - r1) % nb]
            crosses.append((b1, b2))
            row_bin[b1 * lstop:(b1 + 1) * lstop] = k1
            row_bin[b2 * lstop:(b2 + 1) * lstop] = m - k1
            seen.add(b1)
            seen.add(b2)
    return selfs, crosses, row_bin


@functools.lru_cache(maxsize=4)
def _packed_tail_mats(lstop: int):
    """(dp, dp_rev, dp_rev0): the packed DFT-lstop matrix and its
    output-row-permuted variants sigma(j) = L-1-j / (L-j) % L, used to
    produce the Hermitian-partner rows aligned with the natural rows.
    All three carry the Hermitian unpack's 1/2 factor (E = (Zk +
    conj(Zm-k))/2, O likewise) baked in, so the per-block VPU algebra in
    _packed_tail_power/_packed_tail_spectrum is pure adds/subs there."""
    dp = 0.5 * _packed_dft(lstop)
    sig_rev = np.arange(lstop)[::-1]                       # L-1-j
    sig_rev0 = (lstop - np.arange(lstop)) % lstop          # (L-j) % L
    def permuted(sig):
        return np.concatenate([dp[:lstop][sig], dp[lstop:][sig]],
                              axis=0).astype(np.float32)
    return dp.astype(np.float32), permuted(sig_rev), permuted(sig_rev0)


@functools.lru_cache(maxsize=16)
def _packed_wk(nfft: int, lstop: int):
    """(m, 1) cos/sin of w_k = exp(-2*pi*i*bin(row)/nfft) aligned to the
    NATURAL tail row order of the m = nfft/2 FFT."""
    m = nfft // 2
    nb = m // lstop
    bits = nb.bit_length() - 1
    brev = np.array([_brev_val(b, bits) for b in range(nb)])
    rows = np.arange(m)
    k = (rows % lstop) * nb + brev[rows // lstop]
    ang = -2.0 * np.pi * k / nfft
    return (np.cos(ang).reshape(m, 1).astype(np.float32),
            np.sin(ang).reshape(m, 1).astype(np.float32))


@functools.lru_cache(maxsize=16)
def _mel_matrix_packed(nfft: int, n_mels: int, sample_rate: float,
                       fmin: float, fmax: float, variant: str, lstop: int):
    """(mels_p, m) mel weights in the packed STORAGE row order plus the
    (mels_p, 1) Nyquist-bin column.  Each one-sided bin 0..m-1 appears in
    storage exactly once, so the weights are the plain filterbank columns —
    no Hermitian fold needed (bin m rides the separate column)."""
    from vv_dsp_tpu.ops import mel as _mel

    m = nfft // 2
    fb = _mel.mel_filterbank_np(nfft, n_mels, sample_rate, fmin, fmax,
                                variant).astype(np.float32)   # (n_mels, m+1)
    _, _, row_bin = _packed_pair_plan(m, lstop)
    mels_p = _round_up(n_mels, 128)
    out = np.zeros((mels_p, m), np.float32)
    out[:n_mels] = fb[:, row_bin]
    nyq = np.zeros((mels_p, 1), np.float32)
    nyq[:n_mels, 0] = fb[:, m]
    return out, nyq


def stft_mel_packed_supported(nfft: int, hop: int) -> bool:
    """Geometry the packed-real fused kernel handles: pow2 nfft in
    [256, 4096] (the m = nfft/2 tiles bound VMEM exactly like the plain
    kernel's nfft <= 2048 bound), hop | nfft, hop % 16 == 0 (the half-rate
    hop must stay sublane-aligned), and q = nfft/hop <= 128."""
    return (256 <= nfft <= 4096 and nfft & (nfft - 1) == 0
            and hop > 0 and nfft % hop == 0 and hop % 16 == 0
            and nfft // hop <= 128)


def _packed_tail_power(sre_ref, sim_ref, dp_ref, dpr_ref, dpr0_ref, wkr_ref,
                       wki_ref, *, m, tk, lstop, selfs, crosses,
                       algorithm="f32"):
    """DFT-lstop tail + Hermitian-unpack powers, in place: on return
    sre_ref rows hold |X[bin(row)]|^2 in the packed STORAGE order and the
    returned (1, tk) row is the Nyquist-bin power."""
    dpv = dp_ref[:]
    dprv = dpr_ref[:]
    dpr0v = dpr0_ref[:]
    nyq_row = None

    def unpack(lo1, nr, ni, rr, ri):
        # the 1/2 of E = (Zk + conj(Zm-k))/2 lives in the tail matrices
        # (_packed_tail_mats), so these are pure adds/subs on the VPU
        er = nr + rr
        ei = ni - ri
        o_r = ni + ri
        o_i = rr - nr
        wr = wkr_ref[lo1:lo1 + lstop]
        wi = wki_ref[lo1:lo1 + lstop]
        wor = wr * o_r - wi * o_i
        woi = wr * o_i + wi * o_r
        p1 = (er + wor) * (er + wor) + (ei + woi) * (ei + woi)
        p2 = (er - wor) * (er - wor) + (ei - woi) * (ei - woi)
        return p1, p2

    for b, kind in selfs:
        lo = b * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        nv = _dot_alg(dpv, packed, algorithm)
        rv = _dot_alg(dpr0v if kind == 0 else dprv, packed, algorithm)
        p1, p2 = unpack(lo, nv[:lstop], nv[lstop:], rv[:lstop], rv[lstop:])
        sre_ref[lo:lo + lstop, :] = p1
        if kind == 0:
            nyq_row = p2[0:1, :]   # row j=0 of the r=0 block: bin m = Nyquist
    for b1, b2 in crosses:
        lo1 = b1 * lstop
        lo2 = b2 * lstop
        packed1 = jnp.concatenate(
            [sre_ref[lo1:lo1 + lstop, :], sim_ref[lo1:lo1 + lstop, :]],
            axis=0)
        packed2 = jnp.concatenate(
            [sre_ref[lo2:lo2 + lstop, :], sim_ref[lo2:lo2 + lstop, :]],
            axis=0)
        nv = _dot_alg(dpv, packed1, algorithm)
        rv = _dot_alg(dprv, packed2, algorithm)
        p1, p2 = unpack(lo1, nv[:lstop], nv[lstop:], rv[:lstop], rv[lstop:])
        sre_ref[lo1:lo1 + lstop, :] = p1
        sre_ref[lo2:lo2 + lstop, :] = p2
    return nyq_row


def _stft_mel_packed_kernel(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref,
                            dp_ref, dpr_ref, dpr0_ref, wkr_ref, wki_ref,
                            mel_ref, nyq_ref, *rest, m, mhop, q, tk, lanes_p,
                            n_stages, lstop, selfs, crosses, fuse_mfcc=False,
                            log_eps=0.0, algorithm="f32",
                            valid_blocks=None):
    if fuse_mfcc:
        dct_ref, out_ref, xv, sre_ref, sim_ref, sem = rest
    else:
        out_ref, xv, sre_ref, sim_ref, sem = rest
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    # ONE DMA of the plain interleaved hop-block tile; the parity split is
    # an in-VMEM sublane deinterleave (~free: +0.02 ms at flagship
    # geometry, vs ~2.3 ms for any host-side XLA parity transpose)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()

    xvv = xv[:]
    if valid_blocks is not None:
        # tiled-handoff inputs carry convolution tail past the signal in
        # the lanes >= valid_blocks (the upstream banded kernel's extra
        # segments) — the staged path zero-pads there, so mask for parity
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, lanes_p), 1)
                + fbk * tk)
        xvv = jnp.where(lane < valid_blocks, xvv,
                        jnp.zeros_like(xvv))
    v = xvv.reshape(mhop, 2, lanes_p)
    xevv = v[:, 0, :]
    xovv = v[:, 1, :]
    for r in range(q):
        pe = xevv if r == 0 else pltpu.roll(xevv, lanes_p - r, 1)
        po = xovv if r == 0 else pltpu.roll(xovv, lanes_p - r, 1)
        sre_ref[r * mhop:(r + 1) * mhop, :] = (
            pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
        sim_ref[r * mhop:(r + 1) * mhop, :] = (
            po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])

    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages, real_input=False)
    nyq_row = _packed_tail_power(sre_ref, sim_ref, dp_ref, dpr_ref, dpr0_ref,
                                 wkr_ref, wki_ref, m=m, tk=tk, lstop=lstop,
                                 selfs=selfs, crosses=crosses,
                                 algorithm=algorithm)
    mel_e = _dot_alg(mel_ref[:], sre_ref[:], algorithm)
    mel_e = mel_e + nyq_ref[:] * nyq_row
    if fuse_mfcc:
        lm = jnp.log(mel_e + jnp.float32(log_eps))
        mel_e = _dot_alg(dct_ref[:], lm, algorithm)
    out_ref[0, :, :] = mel_e.T


def _stft_mel_call_packed(x, nfft, hop, n_mels, sample_rate, window,
                          window_param, fmin, fmax, variant, interpret,
                          dct_lift=None, log_eps=0.0, algorithm=None,
                          x_tiled=None, n=None, valid_blocks=None):
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry; "
                         "check stft_mel_packed_supported()")
    if fmax is None:
        fmax = sample_rate / 2.0

    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    if x_tiled is not None:
        # tiled handoff: widen tk only when the upstream banded kernel
        # already produced enough segment lanes (nb(tk) <= its nblk_p) —
        # the handoff contract is validated downstream at the tk chosen
        # here, and tk=128 is always feasible (the pipeline gate checks it)
        nf0 = 1 if n < nfft else 1 + (n - nfft + hop) // hop
        tk = _TK
        for cand in (640, 512, 384, 256):
            lanes_c = _round_up(cand + q - 1, 128)
            nb_c = _round_up(nf0, cand) - cand + lanes_c
            vmem = 4 * cand * (2 * m + 4 * 128 + hop) \
                + 4 * 128 * hop + 2 ** 20
            if nb_c <= x_tiled.shape[2] and vmem <= 12 * 2 ** 20:
                tk = cand
                break
    elif jnp.iscomplexobj(x) or x.ndim != 2:
        tk = _TK
    else:
        nf0 = 1 if x.shape[-1] < nfft \
            else 1 + (x.shape[-1] - nfft + hop) // hop
        tk = _packed_mel_pick_tk(nf0, m, hop)
    lstop = min(_LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    lanes_p = _round_up(tk + q - 1, 128)
    if x_tiled is not None:
        # zero-copy tiled handoff: x_tiled is the upstream banded kernel's
        # raw (c, hop, nblk_p) segment layout — exactly this kernel's
        # prologue output when the upstream b_out equals hop; lanes >=
        # valid_blocks hold post-signal convolution tail and are masked
        # in-kernel.  `n` is the logical signal length.
        if x_tiled.ndim != 3 or x_tiled.shape[1] != hop:
            raise ValueError("x_tiled must be (channels, hop, n_blocks)")
        c = x_tiled.shape[0]
        nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
        nf_p = _round_up(nf, tk)
        nb = nf_p - tk + lanes_p
        if x_tiled.shape[2] < nb:
            raise ValueError(f"x_tiled has {x_tiled.shape[2]} blocks; "
                             f"geometry needs {nb}")
        xt = x_tiled
    else:
        if jnp.iscomplexobj(x):
            raise TypeError("real input required")
        if x.ndim != 2:
            raise ValueError("expected (channels, n)")
        x = config.as_compute(x)
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        c, n = x.shape
        nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
        nf_p = _round_up(nf, tk)
        nb = nf_p - tk + lanes_p
        xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
        # plain interleaved hop-block tiling (identical to the unpacked
        # kernel's prologue); the even/odd parity split happens in-kernel
        # as a sublane deinterleave, which is ~free — every host-side XLA
        # parity transpose measured ~2.3 ms (stride-2 minor emitters)
        xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = _stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = _packed_tail_mats(lstop)
    wkr, wki = _packed_wk(nfft, lstop)
    selfs, crosses, _ = _packed_pair_plan(m, lstop)
    melm, nyqcol = _mel_matrix_packed(nfft, n_mels, float(sample_rate),
                                      float(fmin), float(fmax), variant,
                                      lstop)
    mels_p = melm.shape[0]
    fuse = dct_lift is not None

    kernel = functools.partial(
        _stft_mel_packed_kernel, m=m, mhop=mhop, q=q, tk=tk, lanes_p=lanes_p,
        n_stages=n_stages, lstop=lstop, selfs=tuple(selfs),
        crosses=tuple(crosses), fuse_mfcc=fuse, log_eps=float(log_eps),
        algorithm=_dot_algorithm(algorithm), valid_blocks=valid_blocks)
    const = lambda shape: pl.BlockSpec(shape, lambda c, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        const((m, 1)), const((m, 1)), const(twr.shape), const(twi.shape),
        const(dp.shape), const(dpr.shape), const(dpr0.shape),
        const((m, 1)), const((m, 1)), const(melm.shape), const(nyqcol.shape),
    ]
    args = [xt, jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
            jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
            jnp.asarray(dpr0), jnp.asarray(wkr), jnp.asarray(wki),
            jnp.asarray(melm), jnp.asarray(nyqcol)]
    if fuse:
        in_specs.append(const(dct_lift.shape))
        args.append(jnp.asarray(dct_lift))
    out = pl.pallas_call(
        kernel,
        grid=(c, nf_p // tk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tk, mels_p), lambda c, f: (c, f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nf_p, mels_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return out, nf


def _packed_tail_spectrum(sre_ref, sim_ref, ore_ref, oim_ref, dp_ref,
                          dpr_ref, dpr0_ref, wkr_ref, wki_ref, *, m, tk,
                          lstop, selfs, crosses, algorithm="f32"):
    """DFT-lstop tail + Hermitian-unpack SPECTRUM, writing X values into
    ore/oim: row layout is the packed STORAGE order (p1 rows hold
    X[bin(row)], partner rows hold X[m - bin]), with the Nyquist bin X[m]
    (real) written into row `m` of the (m + 8)-row output tiles."""
    dpv = dp_ref[:]
    dprv = dpr_ref[:]
    dpr0v = dpr0_ref[:]

    def eo(lo1, nr, ni, rr, ri):
        # the 1/2 of E = (Zk + conj(Zm-k))/2 lives in the tail matrices
        # (_packed_tail_mats), so these are pure adds/subs on the VPU
        er = nr + rr
        ei = ni - ri
        o_r = ni + ri
        o_i = rr - nr
        wr = wkr_ref[lo1:lo1 + lstop]
        wi = wki_ref[lo1:lo1 + lstop]
        wor = wr * o_r - wi * o_i
        woi = wr * o_i + wi * o_r
        return er, ei, wor, woi

    for b, kind in selfs:
        lo = b * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        nv = _dot_alg(dpv, packed, algorithm)
        rv = _dot_alg(dpr0v if kind == 0 else dprv, packed, algorithm)
        er, ei, wor, woi = eo(lo, nv[:lstop], nv[lstop:], rv[:lstop],
                              rv[lstop:])
        ore_ref[lo:lo + lstop, :] = er + wor
        oim_ref[lo:lo + lstop, :] = ei + woi
        if kind == 0:
            # row j=0: X[m] = E[0] - O[0], real (w_0 = 1 so wO == O there)
            ore_ref[m:m + 1, :] = er[0:1, :] - wor[0:1, :]
            oim_ref[m:m + 1, :] = ei[0:1, :] - woi[0:1, :]
    for b1, b2 in crosses:
        lo1 = b1 * lstop
        lo2 = b2 * lstop
        packed1 = jnp.concatenate(
            [sre_ref[lo1:lo1 + lstop, :], sim_ref[lo1:lo1 + lstop, :]],
            axis=0)
        packed2 = jnp.concatenate(
            [sre_ref[lo2:lo2 + lstop, :], sim_ref[lo2:lo2 + lstop, :]],
            axis=0)
        nv = _dot_alg(dpv, packed1, algorithm)
        rv = _dot_alg(dprv, packed2, algorithm)
        er, ei, wor, woi = eo(lo1, nv[:lstop], nv[lstop:], rv[:lstop],
                              rv[lstop:])
        ore_ref[lo1:lo1 + lstop, :] = er + wor
        oim_ref[lo1:lo1 + lstop, :] = ei + woi
        # X[m - k] = conj(E - wO), stored at the partner block's rows
        ore_ref[lo2:lo2 + lstop, :] = er - wor
        oim_ref[lo2:lo2 + lstop, :] = woi - ei


def _stft_spectrum_packed_kernel(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref,
                                 dp_ref, dpr_ref, dpr0_ref, wkr_ref,
                                 wki_ref, ore_ref, oim_ref, xv, sre_ref,
                                 sim_ref, sem, *, m, mhop, q, tk, lanes_p,
                                 n_stages, lstop, selfs, crosses,
                                 algorithm):
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    v = xv[:].reshape(mhop, 2, lanes_p)
    xevv = v[:, 0, :]
    xovv = v[:, 1, :]
    for r in range(q):
        pe = xevv if r == 0 else pltpu.roll(xevv, lanes_p - r, 1)
        po = xovv if r == 0 else pltpu.roll(xovv, lanes_p - r, 1)
        sre_ref[r * mhop:(r + 1) * mhop, :] = (
            pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
        sim_ref[r * mhop:(r + 1) * mhop, :] = (
            po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])
    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages, real_input=False)
    _packed_tail_spectrum(sre_ref, sim_ref, ore_ref.at[0], oim_ref.at[0],
                          dp_ref, dpr_ref, dpr0_ref, wkr_ref, wki_ref,
                          m=m, tk=tk, lstop=lstop, selfs=selfs,
                          crosses=crosses, algorithm=algorithm)


def _stft_spectrum_packed_kernel_manual(xt_hbm, we_ref, wo_ref, twr_ref,
                                        twi_ref, dp_ref, dpr_ref, dpr0_ref,
                                        wkr_ref, wki_ref, ore_hbm, oim_hbm,
                                        xv, sre_ref, sim_ref, obr, obi, sem,
                                        osem, *, m, mhop, q, tk, lanes_p,
                                        steps, n_chan, n_stages, lstop,
                                        selfs, crosses, algorithm):
    """Spectrum planes leave through MANUAL single-buffered DMA writes
    (HBM out refs + async copy, waiting for the previous step's write
    before reusing the scratch) instead of double-buffered out_specs
    blocks: saving the 2 x (m_pad, tk) x 4B second buffer is what lets
    nfft=2048 run tk=512 safely — measured 1.29 vs 2.01 ms on the
    2048/512 c2c row at 16ch x 479k, bit-exact
    (benchmarks/attr_spectrum_manual_out.py, round 5).  ONLY used at
    m = 1024: with no BlockSpec operands at all, Mosaic stops
    overlapping the per-step DMAs with compute (~7 us/step), which
    regressed every OTHER geometry 20-30% when this was made the
    default — the double-buffered out_specs form wins wherever its VMEM
    fits the optimal tile."""
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    v = xv[:].reshape(mhop, 2, lanes_p)
    xevv = v[:, 0, :]
    xovv = v[:, 1, :]
    for r in range(q):
        pe = xevv if r == 0 else pltpu.roll(xevv, lanes_p - r, 1)
        po = xovv if r == 0 else pltpu.roll(xovv, lanes_p - r, 1)
        sre_ref[r * mhop:(r + 1) * mhop, :] = (
            pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
        sim_ref[r * mhop:(r + 1) * mhop, :] = (
            po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])
    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages, real_input=False)
    first = jnp.logical_and(c == 0, fbk == 0)

    @pl.when(jnp.logical_not(first))
    def _():
        # same-shape descriptor -> same semaphore byte count as the
        # previous step's write
        pc = c - jnp.where(fbk == 0, 1, 0)
        pfb = jnp.where(fbk == 0, steps - 1, fbk - 1)
        pltpu.make_async_copy(
            obr, ore_hbm.at[pc, :, pl.ds(pfb * tk, tk)], osem.at[0]).wait()
        pltpu.make_async_copy(
            obi, oim_hbm.at[pc, :, pl.ds(pfb * tk, tk)], osem.at[1]).wait()
    _packed_tail_spectrum(sre_ref, sim_ref, obr, obi, dp_ref,
                          dpr_ref, dpr0_ref, wkr_ref, wki_ref, m=m, tk=tk,
                          lstop=lstop, selfs=selfs, crosses=crosses,
                          algorithm=algorithm)
    w1 = pltpu.make_async_copy(
        obr, ore_hbm.at[c, :, pl.ds(fbk * tk, tk)], osem.at[0])
    w2 = pltpu.make_async_copy(
        obi, oim_hbm.at[c, :, pl.ds(fbk * tk, tk)], osem.at[1])
    w1.start()
    w2.start()
    last = jnp.logical_and(c == n_chan - 1, fbk == steps - 1)

    @pl.when(last)
    def _():
        w1.wait()
        w2.wait()


def _stft_power_packed_kernel(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref,
                              dp_ref, dpr_ref, dpr0_ref, wkr_ref, wki_ref,
                              out_ref, xv, sre_ref, sim_ref, sem, *, m,
                              mhop, q, tk, lanes_p, n_stages, lstop, selfs,
                              crosses, algorithm):
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    v = xv[:].reshape(mhop, 2, lanes_p)
    xevv = v[:, 0, :]
    xovv = v[:, 1, :]
    for r in range(q):
        pe = xevv if r == 0 else pltpu.roll(xevv, lanes_p - r, 1)
        po = xovv if r == 0 else pltpu.roll(xovv, lanes_p - r, 1)
        sre_ref[r * mhop:(r + 1) * mhop, :] = (
            pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
        sim_ref[r * mhop:(r + 1) * mhop, :] = (
            po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])
    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages, real_input=False)
    nyq_row = _packed_tail_power(sre_ref, sim_ref, dp_ref, dpr_ref,
                                 dpr0_ref, wkr_ref, wki_ref, m=m, tk=tk,
                                 lstop=lstop, selfs=selfs, crosses=crosses,
                                 algorithm=algorithm)
    out_ref[0, :m, :] = sre_ref[:]
    out_ref[0, m:m + 1, :] = nyq_row


def stft_power_packed(x, nfft: int, hop: int, window: str = "hann",
                      window_param=None, interpret: bool | None = None,
                      algorithm: str | None = None):
    """One-sided power spectrogram |rfft(w*frame)|^2 via the packed-real
    Stockham kernel: (channels, n) -> (channels, frames, nfft//2+1) in
    NATURAL bin order.  Half the butterfly/tail work and half the raw
    output rows of stft_power_stockham.  Matches STFT(...).power to f32
    rounding."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry; "
                         "check stft_mel_packed_supported()")
    if jnp.iscomplexobj(x):
        raise TypeError("stft_power_packed requires real input")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    tk = _pick_tk(nf, 4 * (2 * m + 4 * (m + 8) + hop),
                  fixed_bytes=4 * 128 * hop + 2 ** 20)
    lstop = min(_LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = _stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = _packed_tail_mats(lstop)
    wkr, wki = _packed_wk(nfft, lstop)
    selfs, crosses, _ = _packed_pair_plan(m, lstop)
    m_pad = m + 8

    kernel = functools.partial(
        _stft_power_packed_kernel, m=m, mhop=mhop, q=q, tk=tk,
        lanes_p=lanes_p, n_stages=n_stages, lstop=lstop,
        selfs=tuple(selfs), crosses=tuple(crosses),
        algorithm=_dot_algorithm(algorithm))
    const = lambda shape: pl.BlockSpec(shape, lambda c, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(c, nf_p // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            const((m, 1)), const((m, 1)), const(twr.shape),
            const(twi.shape), const(dp.shape), const(dpr.shape),
            const(dpr0.shape), const((m, 1)), const((m, 1)),
        ],
        out_specs=pl.BlockSpec((1, m_pad, tk), lambda c, f: (c, 0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, m_pad, nf_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
      jnp.asarray(dpr0), jnp.asarray(wkr), jnp.asarray(wki))
    pw = jnp.swapaxes(out, -1, -2)[:, :nf, :]
    return _packed_natural_onesided(pw, m, lstop)


@functools.lru_cache(maxsize=16)
def _packed_residue_plan(m: int, lstop: int):
    """Per-residue (block_index, ascending) table when the packed storage
    rows are blockwise-affine in bin index: storage block j (rows
    [j*lstop, (j+1)*lstop)) holds bins start_j +/- i*nb, nb = m//lstop.
    Measured fact exploited by the natural-order epilogues below: a bin
    reorder that is aligned slices + reverses + ONE interleaving stack
    costs one fused XLA pass (~0.27 ms at 1024/256, 16ch x 480k on v5e)
    where the equivalent jnp.take gather costs 0.8-1.1 ms. Returns None
    when the structure doesn't hold (callers fall back to the gather)."""
    bins = _packed_storage_bins(m, lstop, m + 8)
    nb = m // lstop
    if nb < 1 or bins[m] != m:
        return None
    plan = {}
    for j in range(nb):
        blk = bins[j * lstop:(j + 1) * lstop]
        if lstop > 1:
            d = np.unique(np.diff(blk))
            if len(d) != 1 or abs(int(d[0])) != nb:
                return None
            asc = int(d[0]) > 0
        else:
            asc = True
        r = int(blk[0] % nb) if asc else int(blk[-1] % nb)
        if r in plan or blk.min() % nb != r:
            return None
        plan[r] = (j, asc)
    if sorted(plan) != list(range(nb)):
        return None
    return tuple(plan[r] for r in range(nb))


def _packed_natural_onesided(pw, m: int, lstop: int):
    """(..., m_pad storage rows) -> (..., m+1) natural bins, gather-free
    when the residue structure holds (one interleaving stack pass)."""
    plan = _packed_residue_plan(m, lstop)
    if plan is None:
        bins = _packed_storage_bins(m, lstop, pw.shape[-1])
        inv = np.zeros(m + 1, dtype=np.int64)
        inv[bins[bins >= 0]] = np.nonzero(bins >= 0)[0]
        return jnp.take(pw, jnp.asarray(inv), axis=-1)
    seqs = []
    for j, asc in plan:
        s = pw[..., j * lstop:(j + 1) * lstop]
        seqs.append(s if asc else s[..., ::-1])
    nat = jnp.stack(seqs, axis=-1).reshape(*pw.shape[:-1], m)
    return jnp.concatenate([nat, pw[..., m:m + 1]], axis=-1)


def _packed_natural_full(pw_re, pw_im, m: int, lstop: int):
    """Storage-row (re, im) planes -> (..., 2m) natural-order FULL complex
    spectrum, with the Hermitian mirror (X[2m-k] = conj(X[k])) folded into
    the same single interleaving pass: residue-r lane of the full spectrum
    is [block_r ; reversed conj block_{nb-r}] (residue 0 threads the
    Nyquist row between its own block and its own reversed mirror)."""
    plan = _packed_residue_plan(m, lstop)
    if plan is None:
        half = jax.lax.complex(_packed_natural_onesided(pw_re, m, lstop),
                               _packed_natural_onesided(pw_im, m, lstop))
        from vv_dsp_tpu.ops import fft as _fftmod
        return _fftmod.hermitian_expand(half, 2 * m)
    nb = m // lstop

    def blk(p, r):
        j, asc = plan[r]
        s = p[..., j * lstop:(j + 1) * lstop]
        return s if asc else s[..., ::-1]

    seq_re, seq_im = [], []
    for r in range(nb):
        br, bi = blk(pw_re, r), blk(pw_im, r)
        if r == 0:
            sr = jnp.concatenate([br, pw_re[..., m:m + 1],
                                  br[..., 1:][..., ::-1]], -1)
            si = jnp.concatenate([bi, pw_im[..., m:m + 1],
                                  -bi[..., 1:][..., ::-1]], -1)
        else:
            mr, mi = blk(pw_re, nb - r), blk(pw_im, nb - r)
            sr = jnp.concatenate([br, mr[..., ::-1]], -1)
            si = jnp.concatenate([bi, -mi[..., ::-1]], -1)
        seq_re.append(sr)
        seq_im.append(si)
    fr = jnp.stack(seq_re, axis=-1).reshape(*pw_re.shape[:-1], 2 * m)
    fi = jnp.stack(seq_im, axis=-1).reshape(*pw_im.shape[:-1], 2 * m)
    return jax.lax.complex(fr, fi)


def _packed_storage_from_natural(nat, m: int, lstop: int, m_pad: int):
    """Inverse of _packed_natural_onesided: natural (..., m+1) bins ->
    (..., m_pad) storage rows, gather-free when the residue structure
    holds (block j = strided slice at its residue, reversed when the
    block descends; dead rows m+1.. replicate bin 0, matching the
    where(src>=0, src, 0) gather they replace)."""
    plan = _packed_residue_plan(m, lstop)
    if plan is None:
        src = _packed_storage_bins(m, lstop, m_pad)
        idx = jnp.asarray(np.where(src >= 0, src, 0))
        return jnp.take(nat, idx, axis=-1)
    nb = m // lstop
    blocks = [None] * nb
    for r in range(nb):
        j, asc = plan[r]
        s = nat[..., r: r + nb * lstop: nb]
        blocks[j] = s if asc else s[..., ::-1]
    dead = jnp.broadcast_to(nat[..., 0:1], (*nat.shape[:-1], m_pad - m - 1))
    return jnp.concatenate([*blocks, nat[..., m:m + 1], dead], axis=-1)


def _stockham_storage_from_natural(nat, nfft: int, lstop: int,
                                   hermitian: bool, negate_mirror: bool):
    """Inverse of _stockham_natural: natural bins -> plain-Stockham storage
    rows (row p = lstop*b + k holds bin k*nb + bitrev(b)).  With
    hermitian=True, nat has nfft//2+1 bins and rows for bins above nfft/2
    take the mirror bin nfft-b (negate_mirror flips their sign — the
    conjugate, applied to the imag plane)."""
    nb = nfft // lstop
    brv = _bitrev_perm(nb)
    half = lstop // 2
    blocks = []
    for b in range(nb):
        r = int(brv[b])
        if not hermitian:
            blocks.append(nat[..., r::nb])
            continue
        lower = nat[..., r: r + nb * half: nb]         # k < lstop/2
        if r == 0:
            nyq = nat[..., nfft // 2: nfft // 2 + 1]   # k = lstop/2
            mirror = lower[..., 1:][..., ::-1]          # k > lstop/2
        else:
            rm = nb - r
            mirror_src = nat[..., rm: rm + nb * half: nb]
            # k = lstop/2: bin m + r -> mirror bin m - r = element
            # lstop/2 - 1 of the residue-(nb-r) slice; k > lstop/2 walk
            # down from there
            mirror = mirror_src[..., ::-1]
        if negate_mirror:
            mirror = -mirror
        if r == 0:
            blocks.append(jnp.concatenate([lower, nyq, mirror], axis=-1))
        else:
            blocks.append(jnp.concatenate([lower, mirror], axis=-1))
    return jnp.concatenate(blocks, axis=-1)


def _stockham_natural(pw, nfft: int, lstop: int, onesided: bool):
    """Plain-Stockham storage rows -> natural bin order, gather-free.
    Row p = lstop*b + k holds bin k*nb + bitrev(b) (module docstring), so
    storage block b is an ascending stride-nb run at residue bitrev(b):
    the reorder is aligned slices + one interleaving stack, one fused XLA
    pass instead of a jnp.take gather (same finding as
    _packed_residue_plan)."""
    nb = nfft // lstop
    brv = _bitrev_perm(nb)
    if onesided:
        half = lstop // 2
        seqs = [pw[..., brv[r] * lstop: brv[r] * lstop + half]
                for r in range(nb)]
        nat = jnp.stack(seqs, axis=-1).reshape(*pw.shape[:-1], nfft // 2)
        nyq = pw[..., brv[0] * lstop + half: brv[0] * lstop + half + 1]
        return jnp.concatenate([nat, nyq], axis=-1)
    seqs = [pw[..., brv[r] * lstop: (brv[r] + 1) * lstop] for r in range(nb)]
    return jnp.stack(seqs, axis=-1).reshape(*pw.shape[:-1], nfft)


@functools.lru_cache(maxsize=16)
def _packed_storage_bins(m: int, lstop: int, m_pad: int) -> np.ndarray:
    """bin held by each packed-storage output row (rows m..m_pad-1 are
    dead padding except row m = Nyquist)."""
    _, _, row_bin = _packed_pair_plan(m, lstop)
    out = np.full(m_pad, -1, dtype=np.int64)
    out[:m] = row_bin
    out[m] = m
    return out


@functools.lru_cache(maxsize=4)
def _packed_idft_rev(lstop: int, m: int) -> np.ndarray:
    """_packed_idft with the INPUT rows reversed (columns permuted by
    L-1-j in both the re and im halves): partner blocks of the packed
    inverse hold their Z rows in reversed natural order (storage row j of
    block b2 carries the bin of b2's natural row L-1-j), and folding the
    reversal into the tail matrix keeps the kernel free of sublane
    reversals."""
    dpi = _packed_idft(lstop, m)
    sig = np.arange(lstop)[::-1]
    cols = np.concatenate([sig, lstop + sig])
    return np.ascontiguousarray(dpi[:, cols]).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _packed_self_perms(lstop: int):
    """Packed [P 0; 0 P] row-permutation matrices aligning a self-paired
    block's Hermitian-partner rows: sigma0(j) = (L-j) % L for the r=0
    block, L-1-j for the r=nb/2 block."""
    def packed(sig):
        p = np.zeros((lstop, lstop), np.float32)
        p[np.arange(lstop), sig] = 1.0
        z = np.zeros_like(p)
        return np.block([[p, z], [z, p]]).astype(np.float32)

    sig0 = (lstop - np.arange(lstop)) % lstop
    sigr = np.arange(lstop)[::-1]
    return packed(sig0), packed(sigr)


def _packed_repack_inverse(xre, xim, zre, zim, dpi_ref, dpir_ref, p0_ref,
                           pr_ref, wkr_ref, wki_ref, twr_ref, twi_ref, *,
                           m, tk, lstop, n_stages, selfs, crosses,
                           algorithm):
    """Hermitian REpack Z[k] = Ye + j*Yo (Ye = (X[k] + conj(X[m-k]))/2,
    Yo = w^{-k}(X[k] - conj(X[m-k]))/2) from one-sided X in packed STORAGE
    layout (xre/xim, m+8 rows with the Nyquist at row m), followed by the
    m-point inverse FFT (idft tail + inverse butterflies) — the shared back
    half of istft_packed and the packed gate kernel.  Partner blocks carry
    their Z rows reversed, folded into a reversed-input tail matrix; self
    blocks get their partner rows via tiny permutation matmuls."""
    def repack(lo1, xkr, xki, xmr, xmi):
        yer = 0.5 * (xkr + xmr)
        yei = 0.5 * (xki - xmi)
        d_r = 0.5 * (xkr - xmr)
        d_i = 0.5 * (xki + xmi)
        wr = wkr_ref[lo1:lo1 + lstop]
        wi = wki_ref[lo1:lo1 + lstop]
        yor = wr * d_r + wi * d_i      # w^{-k} d
        yoi = wr * d_i - wi * d_r
        # partner rows: Ye' = conj-ish mix, w^{-(m-k)} = -w^{+k}
        yer2 = 0.5 * (xmr + xkr)
        yei2 = 0.5 * (xmi - xki)
        d2r = 0.5 * (xmr - xkr)
        d2i = 0.5 * (xmi + xki)
        yor2 = -(wr * d2r - wi * d2i)  # (-wr, -wi) * d2
        yoi2 = -(wr * d2i + wi * d2r)
        return ((yer - yoi, yei + yor), (yer2 - yoi2, yei2 + yor2))

    for b, kind in selfs:
        lo = b * lstop
        xkr = xre[lo:lo + lstop, :]
        xki = xim[lo:lo + lstop, :]
        packed = jnp.concatenate([xkr, xki], axis=0)
        pv = _dot_alg(p0_ref[:] if kind == 0 else pr_ref[:], packed, "f32")
        z1, _ = repack(lo, xkr, xki, pv[:lstop], pv[lstop:])
        zre[lo:lo + lstop, :] = z1[0]
        zim[lo:lo + lstop, :] = z1[1]
        if kind == 0:
            # row 0 exact: X[0+m] is the Nyquist ROW, not conj(X[0])
            x0r = xre[lo:lo + 1, :]
            x0i = xim[lo:lo + 1, :]
            xnr = xre[m:m + 1, :]
            xni = xim[m:m + 1, :]
            yer = 0.5 * (x0r + xnr)
            yei = 0.5 * (x0i + xni)
            yor = 0.5 * (x0r - xnr)
            yoi = 0.5 * (x0i - xni)
            zre[lo:lo + 1, :] = yer - yoi
            zim[lo:lo + 1, :] = yei + yor
    for b1, b2 in crosses:
        lo1 = b1 * lstop
        lo2 = b2 * lstop
        z1, z2 = repack(lo1, xre[lo1:lo1 + lstop, :], xim[lo1:lo1 + lstop, :],
                        xre[lo2:lo2 + lstop, :], xim[lo2:lo2 + lstop, :])
        zre[lo1:lo1 + lstop, :] = z1[0]
        zim[lo1:lo1 + lstop, :] = z1[1]
        zre[lo2:lo2 + lstop, :] = z2[0]
        zim[lo2:lo2 + lstop, :] = z2[1]

    # inverse m-point FFT (1/m folded into the idft tail); partner blocks
    # carry their Z rows reversed -> reversed-input tail matrix
    dpiv = dpi_ref[:]
    dpirv = dpir_ref[:]
    partner = {b2 for _, b2 in crosses}
    for b_ in range(m // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [zre[lo:lo + lstop, :], zim[lo:lo + lstop, :]], axis=0)
        o = _dot_alg(dpirv if b_ in partner else dpiv, packed, algorithm)
        zre[lo:lo + lstop, :] = o[:lstop]
        zim[lo:lo + lstop, :] = o[lstop:]
    _inverse_stages(zre, zim, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages)


def _ola_accumulate(y, w_ref, *, nfft, hop, q, tk, sw):
    """Window + overlap-add a (nfft, tk) frame tile into the (hop, tk + sw)
    strip: frame j's segment r lands in strip column j + r (slot st*tk+j+r),
    columns >= tk being next-tile spill.  sw = round_up(q-1, 128) keeps the
    spill strip one lane-tile wide instead of the old full-tk mirror strip
    (half the OLA roll traffic and output write volume)."""
    y = y * w_ref[:]
    acc = jnp.zeros((hop, tk + sw), jnp.float32)
    for r in range(q):
        part = jnp.pad(y[r * hop:(r + 1) * hop, :], ((0, 0), (0, sw)))
        acc = acc + (part if r == 0 else pltpu.roll(part, r, 1))
    return acc


def _istft_packed_kernel(re_ref, im_ref, w_ref, twr_ref, twi_ref, dpi_ref,
                         dpir_ref, p0_ref, pr_ref, wkr_ref, wki_ref,
                         out_ref, spill_ref, zre, zim, *, m, nfft,
                         hop, q, tk, sw, n_stages, lstop, selfs, crosses,
                         algorithm, thresh2=None):
    if thresh2 is None:
        xre, xim = re_ref, im_ref
    else:
        # in-VMEM spectral gate (the SpectralGate mask): per-frame peak
        # over the one-sided powers — rows 0..m of the storage layout
        # cover exactly the one-sided bins, frames on lanes — then zero
        # the sub-threshold bins.  Costs one VPU pass over data already
        # resident in VMEM; the split spectrum_raw -> gated-inverse pair
        # beats the single fused gate kernel (measured round 5).
        rv = re_ref[:]
        iv = im_ref[:]
        p2 = rv * rv + iv * iv
        peak2 = jnp.max(p2[:m + 1, :], axis=0, keepdims=True)
        keep = p2 >= jnp.float32(thresh2) * peak2
        xre = jnp.where(keep, rv, jnp.zeros_like(rv))
        xim = jnp.where(keep, iv, jnp.zeros_like(iv))
    _packed_repack_inverse(xre, xim, zre, zim, dpi_ref, dpir_ref, p0_ref,
                           pr_ref, wkr_ref, wki_ref, twr_ref, twi_ref,
                           m=m, tk=tk, lstop=lstop, n_stages=n_stages,
                           selfs=selfs, crosses=crosses,
                           algorithm=algorithm)

    # interleave ye/yo to the nfft-sample frame, window, OLA
    y = jnp.stack([zre[:], zim[:]], axis=1).reshape(nfft, tk)
    acc = _ola_accumulate(y, w_ref, nfft=nfft, hop=hop, q=q, tk=tk, sw=sw)
    out_ref[0, 0, :, :] = acc[:, :tk]
    spill_ref[0, 0, :, :] = acc[:, tk:]


def _ola_strips_epilogue(main, spill, c, steps, tk, hop, q, output_len,
                         norm):
    """(c, steps, hop, tk) owned strips + (c, steps, hop, sw) spill ->
    normalized (c, output_len): transpose each to sample-major, fold the
    spill (only its first q-1 columns are ever nonzero) into the head of
    the NEXT step's samples, divide by the w^2 OLA norm."""
    mainT = jnp.swapaxes(main, -1, -2).reshape(c, steps, tk * hop)
    w = (q - 1) * hop
    if w > 0:
        spillT = jnp.swapaxes(spill[..., : q - 1], -1, -2).reshape(
            c, steps, w)
        if steps > 1:
            mainT = mainT.at[:, 1:, :w].add(spillT[:, :-1, :])
        # the LAST step's spill is the signal tail past steps*tk*hop
        # (frames nf-q+1..nf-1 extend nfft-hop samples beyond their slot)
        recon = jnp.concatenate([mainT.reshape(c, steps * tk * hop),
                                 spillT[:, -1, :]], axis=1)
    else:
        recon = mainT.reshape(c, steps * tk * hop)
    total = recon.shape[1]
    if output_len > total:
        recon = jnp.pad(recon, ((0, 0), (0, output_len - total)))
    return recon[:, :output_len] / norm


def istft_packed(spec, nfft: int, hop: int, output_len: int,
                 window: str = "hann", window_param=None,
                 rfft: bool = False, interpret: bool | None = None,
                 algorithm: str | None = None):
    """Inverse STFT with w^2-normalized overlap-add via the PACKED-REAL
    inverse kernel: the real nfft-point inverse runs as an m = nfft/2
    complex inverse FFT of the Hermitian-repacked spectrum
    (Z[k] = Ye + j*Yo), halving the butterfly and idft-tail work of
    istft_stockham.  Same semantics as STFT(...).reconstruct including the
    reference's partial-coverage edge norm.

    Round-5 I/O restructure (benchmarks/attr_istft.py attribution: of the
    old 2.68 ms at 1024/256x16ch, 0.71 ms was the natural->storage
    prologue — dominated by the XLA minor<->major transpose, ~1.0 ms
    standalone on these planes — ~0.99 ms DMA/base, and 0.25 ms the
    spill-add epilogue; the FFT math itself was 0.43 ms): the prologue now
    does ONLY the minor-axis bin permutation (which XLA fuses with the
    complex split + pad into one pass), the planes stay FRAME-major so the
    kernel's double-buffered input blocks are contiguous, the
    bins-on-sublanes working orientation comes from a free Mosaic in-VMEM
    transpose, and the OLA strip keeps a one-lane-tile spill instead of
    mirroring the full tile width (half the roll traffic + output
    volume, epilogue spill-fold measured ~free)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry; "
                         "check stft_mel_packed_supported()")
    if spec.ndim != 3:
        raise ValueError("expected (channels, frames, bins)")
    c, nf, bins = spec.shape
    m = nfft // 2
    q = nfft // hop
    m_pad = m + 8
    tk = _pick_tk(nf, 4 * (4 * m_pad + 4 * m + 2 * hop),
                  fixed_bytes=4 * 2 * 128 * hop + 2 ** 20, cap=512)
    lstop = min(_LSTOP, m)

    if rfft:
        if bins != m + 1:
            raise ValueError("rfft=True expects nfft//2+1 bins")
        half = spec
    else:
        if bins != nfft:
            raise ValueError("rfft=False expects nfft bins")
        half = spec[..., : m + 1]
    nf_p = _round_up(nf, tk)
    # prologue: complex split + storage-row permutation on the minor axis
    # + pad + minor<->major transpose, in ONE XLA pass chain (measured:
    # XLA fuses the permutation and split INTO the transpose — this exact
    # order costs ~0.7 ms at 1024/256x16ch where permute-after-transpose
    # costs 1.37 and an in-kernel Mosaic transpose variant ran 3.1 ms
    # end-to-end against 1.97; see benchmarks/attr_istft.py round-5 logs)
    re_n = _packed_storage_from_natural(jnp.real(half).astype(jnp.float32),
                                        m, lstop, m_pad)
    im_n = _packed_storage_from_natural(jnp.imag(half).astype(jnp.float32),
                                        m, lstop, m_pad)
    re_t = jnp.swapaxes(jnp.pad(re_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                        -1, -2)
    im_t = jnp.swapaxes(jnp.pad(im_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                        -1, -2)
    return _istft_from_storage_planes(
        re_t, im_t, c, nfft, hop, q, m, m_pad, tk, nf, output_len, window,
        window_param, interpret, algorithm)


def _istft_from_storage_planes(re_t, im_t, c, nfft, hop, q, m, m_pad, tk,
                               nf, output_len, window, window_param,
                               interpret, algorithm,
                               gate_threshold=None):
    """Shared back half of istft_packed / istft_packed_from_storage: run
    the packed inverse kernel over bins-major (c, m_pad, nf_p)
    storage-layout planes (the forward spectrum kernel's raw output
    layout) and fold the OLA strips."""
    from vv_dsp_tpu.ops.window import get_window_np

    sw = _round_up(max(q - 1, 1), 128)
    lstop = min(_LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    nf_p = re_t.shape[2]
    steps = nf_p // tk

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(m, n_stages)
    dpi = _packed_idft(lstop, m)
    dpir = _packed_idft_rev(lstop, m)
    p0, pr = _packed_self_perms(lstop)
    wkr, wki = _packed_wk(nfft, lstop)
    selfs, crosses, _ = _packed_pair_plan(m, lstop)

    kernel = functools.partial(
        _istft_packed_kernel, m=m, nfft=nfft, hop=hop, q=q, tk=tk, sw=sw,
        n_stages=n_stages, lstop=lstop, selfs=tuple(selfs),
        crosses=tuple(crosses), algorithm=_dot_algorithm(algorithm),
        thresh2=(None if gate_threshold is None
                 else float(gate_threshold) ** 2))
    const = lambda shape: pl.BlockSpec(shape, lambda c, s: (0, 0),
                                       memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((None, m_pad, tk), lambda c, s: (c, 0, s),
                         memory_space=pltpu.VMEM)
    main, spill = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=[
            plane, plane,
            const((nfft, 1)), const(twr.shape), const(twi.shape),
            const(dpi.shape), const(dpir.shape), const(p0.shape),
            const(pr.shape), const((m, 1)), const((m, 1)),
        ],
        out_specs=(pl.BlockSpec((1, 1, hop, tk), lambda c, s: (c, s, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, hop, sw), lambda c, s: (c, s, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((c, steps, hop, tk), jnp.float32),
                   jax.ShapeDtypeStruct((c, steps, hop, sw), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
        ],
        interpret=interpret,
    )(re_t, im_t, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dpi), jnp.asarray(dpir),
      jnp.asarray(p0), jnp.asarray(pr), jnp.asarray(wkr),
      jnp.asarray(wki))

    norm = jnp.asarray(_ola_norm_table(nfft, hop, nf, output_len, window,
                                       window_param))
    return _ola_strips_epilogue(main, spill, c, steps, tk, hop, q,
                                output_len, norm)


class PackedSpectrum:
    """Opaque STFT spectrum in the packed kernels' STORAGE layout: two f32
    planes (channels, nfft//2+8, frames_padded) holding the one-sided
    windowed rfft of each frame, rows in packed-storage order (Nyquist at
    row nfft//2, rows above it dead padding).  The zero-copy contract
    between the forward spectrum kernel and the inverse kernel: a
    process_packed -> [pointwise edits] -> reconstruct_packed roundtrip
    skips BOTH natural-order layout passes (measured 1.0-1.4 ms of pure
    relayout per roundtrip at 1024/256 x 16ch x 479k — benchmarks/
    attr_istft.py), which the natural-order API cannot avoid.

    Pointwise spectral edits go through apply_mask / scale (bin-indexed
    constants are permuted into storage order host-side).  Serving-path
    API: no custom autodiff (use STFT.process/reconstruct for training)."""

    def __init__(self, re, im, nfft: int, hop: int, nf: int):
        self.re = re
        self.im = im
        self.nfft = nfft
        self.hop = hop
        self.nf = nf

    @property
    def power_rows(self):
        """|X|^2 in storage-row order (rows above nfft//2 are dead)."""
        return self.re * self.re + self.im * self.im

    def bin_to_row(self) -> np.ndarray:
        """row index holding each natural bin 0..nfft//2 (host constant)."""
        m = self.nfft // 2
        src = _packed_storage_bins(m, min(_LSTOP, m), m + 8)
        inv = np.zeros(m + 1, np.int64)
        inv[src[src >= 0]] = np.nonzero(src >= 0)[0]
        return inv

    def apply_mask(self, mask_natural) -> "PackedSpectrum":
        """Multiply by a per-bin mask given in NATURAL one-sided bin order
        (nfft//2+1 values): the mask is permuted to storage rows host-side
        (tiny constant), the planes scale in one fused elementwise pass."""
        m = self.nfft // 2
        mask_natural = np.asarray(mask_natural, np.float32)
        if mask_natural.shape[-1] != m + 1:
            raise ValueError(f"mask must have {m + 1} one-sided bins")
        src = _packed_storage_bins(m, min(_LSTOP, m), m + 8)
        rows = np.where(src >= 0, mask_natural[np.where(src >= 0, src, 0)],
                        0.0).astype(np.float32)[:, None]
        rj = jnp.asarray(rows)
        return PackedSpectrum(self.re * rj, self.im * rj, self.nfft,
                              self.hop, self.nf)

    def to_natural(self, onesided: bool = True):
        """Materialize the ordinary complex spectrum (channels, frames,
        bins) — the interop escape hatch (costs the layout pass the packed
        roundtrip exists to avoid)."""
        m = self.nfft // 2
        lstop = min(_LSTOP, m)
        pw_re = jnp.swapaxes(self.re, -1, -2)[:, :self.nf, :]
        pw_im = jnp.swapaxes(self.im, -1, -2)[:, :self.nf, :]
        if onesided:
            return jax.lax.complex(
                _packed_natural_onesided(pw_re, m, lstop),
                _packed_natural_onesided(pw_im, m, lstop))
        return _packed_natural_full(pw_re, pw_im, m, lstop)


# pytree registration: planes are leaves, geometry is static aux — so a
# PackedSpectrum crosses jit/vmap boundaries and can be returned from
# jitted serving functions
jax.tree_util.register_pytree_node(
    PackedSpectrum,
    lambda ps: ((ps.re, ps.im), (ps.nfft, ps.hop, ps.nf)),
    lambda aux, kids: PackedSpectrum(kids[0], kids[1], *aux))


def stft_spectrum_packed_raw(x, nfft: int, hop: int, window: str = "hann",
                             window_param=None,
                             interpret: bool | None = None,
                             algorithm: str | None = None) -> PackedSpectrum:
    """Forward STFT via the packed-real kernel, returning the kernel's RAW
    storage-layout planes (PackedSpectrum) with no natural-order epilogue
    — the zero-copy input of istft_packed_from_storage."""
    re, im, nf = _spectrum_packed_planes(x, nfft, hop, window, window_param,
                                         interpret, algorithm)
    return PackedSpectrum(re, im, nfft, hop, nf)


def istft_packed_from_storage(ps: PackedSpectrum, output_len: int,
                              window: str = "hann", window_param=None,
                              interpret: bool | None = None,
                              algorithm: str | None = None,
                              gate_threshold: float | None = None):
    """Inverse STFT from storage-layout planes (PackedSpectrum), skipping
    the natural->storage prologue entirely: the planes feed the inverse
    kernel as-is.  Same OLA/norm semantics as STFT(...).reconstruct.
    gate_threshold applies the SpectralGate per-frame peak mask in-kernel
    (one VPU pass over VMEM-resident data) before the inverse."""
    if interpret is None:
        interpret = not _on_tpu()
    nfft, hop, nf = ps.nfft, ps.hop, ps.nf
    if not stft_mel_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry")
    m = nfft // 2
    m_pad = m + 8
    q = nfft // hop
    c = ps.re.shape[0]
    tk = _pick_tk(nf, 4 * (4 * m_pad + 4 * m + 2 * hop),
                  fixed_bytes=4 * 2 * 128 * hop + 2 ** 20, cap=512)
    nf_have = ps.re.shape[-1]
    nf_p = _round_up(nf_have, tk)
    re_t, im_t = ps.re, ps.im
    if nf_p != nf_have:
        re_t = jnp.pad(re_t, ((0, 0), (0, 0), (0, nf_p - nf_have)))
        im_t = jnp.pad(im_t, ((0, 0), (0, 0), (0, nf_p - nf_have)))
    return _istft_from_storage_planes(
        re_t, im_t, c, nfft, hop, q, m, m_pad, tk, nf, output_len, window,
        window_param, interpret, algorithm, gate_threshold=gate_threshold)


def _spectrum_packed_planes(x, nfft: int, hop: int, window: str,
                            window_param, interpret, algorithm):
    """Run the packed-real forward spectrum kernel, returning its raw
    (c, m_pad, nf_p) storage-layout (re, im) planes + the valid frame
    count — shared by stft_spectrum_packed (natural epilogue) and
    stft_spectrum_packed_raw (zero-copy PackedSpectrum)."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry; "
                         "check stft_mel_packed_supported()")
    if jnp.iscomplexobj(x):
        raise TypeError("stft_spectrum_packed requires real input")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    m_pad = m + 8
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    # m = 1024 (nfft 2048) and m = 2048 (nfft 4096) run the MANUAL
    # single-buffered-output kernel: freeing the second (m_pad, tk) out
    # buffer is what fits tk=512 / tk=256 under the VMEM budget there
    # (measured on the c2c rows: 2048/512 +23%, 4096/1024 1.35 vs 1.58
    # ms, both bit-exact).  Everywhere else the double-buffered out_specs
    # kernel wins — making manual the default regressed every other
    # geometry 20-30% (no BlockSpec operands -> no DMA/compute overlap).
    # m = 2048 is VMEM-fickle: tk=256 compiles at every production hop
    # (hardware-swept, tests/test_tpu_hardware.py) while 384/512 AND 192
    # crash Mosaic — so manual applies there only when the pick lands
    # exactly on 256 (short signals fall back to the known-good dbuf
    # kernel at tk=128).
    manual = m in (1024, 2048)
    if manual:
        tk = _pick_tk(nf, 4 * (2 * m + 2 * m_pad + hop),
                      fixed_bytes=4 * 2 * 128 * hop + 2 ** 20,
                      cap=512 if m == 1024 else 256)
        if m == 2048 and tk != 256:
            manual = False
    if not manual:
        # small geometries (m <= 256) take the 768-wide tile: their whole
        # footprint is ~5 MB, far under every measured ceiling, and the
        # 512-point row gains +5% (6,011 -> 6,318 Msps same-process A/B,
        # round 5); the 512 cap remains the large-m lesson
        tk = _pick_tk(nf, 4 * (2 * m + 4 * m_pad + hop),
                      fixed_bytes=4 * 128 * hop + 2 ** 20,
                      cap=768 if m <= 256 else 512)
    lstop = min(_LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = _stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = _packed_tail_mats(lstop)
    wkr, wki = _packed_wk(nfft, lstop)
    selfs, crosses, _ = _packed_pair_plan(m, lstop)
    steps = nf_p // tk

    const = lambda shape: pl.BlockSpec(shape, lambda c, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        const((m, 1)), const((m, 1)), const(twr.shape),
        const(twi.shape), const(dp.shape), const(dpr.shape),
        const(dpr0.shape), const((m, 1)), const((m, 1)),
    ]
    args = (xt, jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
            jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
            jnp.asarray(dpr0), jnp.asarray(wkr), jnp.asarray(wki))
    if manual:
        kernel = functools.partial(
            _stft_spectrum_packed_kernel_manual, m=m, mhop=mhop, q=q,
            tk=tk, lanes_p=lanes_p, steps=steps, n_chan=c,
            n_stages=n_stages, lstop=lstop, selfs=tuple(selfs),
            crosses=tuple(crosses), algorithm=_dot_algorithm(algorithm))
        re, im = pl.pallas_call(
            kernel,
            grid=(c, steps),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                       pl.BlockSpec(memory_space=pltpu.HBM)),
            out_shape=(jax.ShapeDtypeStruct((c, m_pad, nf_p), jnp.float32),
                       jax.ShapeDtypeStruct((c, m_pad, nf_p), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((hop, lanes_p), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.VMEM((m_pad, tk), jnp.float32),
                pltpu.VMEM((m_pad, tk), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(*args)
        return re, im, nf
    kernel = functools.partial(
        _stft_spectrum_packed_kernel, m=m, mhop=mhop, q=q, tk=tk,
        lanes_p=lanes_p, n_stages=n_stages, lstop=lstop,
        selfs=tuple(selfs), crosses=tuple(crosses),
        algorithm=_dot_algorithm(algorithm))
    spec = pl.BlockSpec((1, m_pad, tk), lambda c, f: (c, 0, f),
                        memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=in_specs,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((c, m_pad, nf_p), jnp.float32),
                   jax.ShapeDtypeStruct((c, m_pad, nf_p), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return re, im, nf


def stft_spectrum_packed(x, nfft: int, hop: int, window: str = "hann",
                         window_param=None, onesided: bool = False,
                         interpret: bool | None = None,
                         algorithm: str | None = None):
    """Windowed complex STFT spectrum via the PACKED-REAL Stockham kernel
    (m = nfft/2 complex FFT + paired-row Hermitian unpack — half the
    butterfly/tail work of stft_spectrum_stockham and half the raw output
    rows): (channels, n) real -> (channels, frames, bins) complex64, bins
    = nfft (two-sided, Hermitian-expanded in XLA) or nfft//2+1.  Matches
    STFT(...).process to f32 rounding."""
    re, im, nf = _spectrum_packed_planes(x, nfft, hop, window, window_param,
                                         interpret, algorithm)
    m = nfft // 2
    lstop = min(_LSTOP, m)
    # natural bin order, gather-free: aligned slices + one interleaving
    # stack (the storage rows are blockwise-affine in bin — see
    # _packed_residue_plan); the two-sided form folds the Hermitian mirror
    # into the SAME pass, so the full c2c spectrum costs one epilogue pass
    # instead of gather + expand (measured 0.27 ms vs 0.82 ms at 1024/256)
    pw_re = jnp.swapaxes(re, -1, -2)[:, :nf, :]
    pw_im = jnp.swapaxes(im, -1, -2)[:, :nf, :]
    if onesided:
        return jax.lax.complex(_packed_natural_onesided(pw_re, m, lstop),
                               _packed_natural_onesided(pw_im, m, lstop))
    return _packed_natural_full(pw_re, pw_im, m, lstop)


def stft_mfcc_pallas_tiled(x_tiled, n: int, valid_blocks: int, nfft: int,
                           hop: int, n_mels: int, n_mfcc: int,
                           sample_rate: float, window: str = "hann",
                           window_param=None, fmin: float = 0.0,
                           fmax: float | None = None,
                           log_epsilon: float = 1e-10, lifter: float = 0.0,
                           variant: str = "htk",
                           interpret: bool | None = None,
                           algorithm: str | None = None):
    """stft_mfcc_pallas on a ZERO-COPY tiled handoff input: x_tiled is the
    upstream banded kernel's raw (channels, hop, n_blocks) segment layout
    (fir_resample_fused_tiled) covering a logical signal of n samples in
    the first valid_blocks segments.  Skips both the upstream epilogue
    transpose and this kernel's prologue transpose."""
    from vv_dsp_tpu.ops.dct import _dct2_matrix
    from vv_dsp_tpu.ops.mel import _lifter_np

    mels_p = _round_up(n_mels, 128)
    d = np.zeros((mels_p, mels_p), np.float32)
    dm = _dct2_matrix(n_mels)[:n_mfcc] * _lifter_np(n_mfcc,
                                                    float(lifter))[:, None]
    d[:n_mfcc, :n_mels] = dm.astype(np.float32)
    out, nf = _stft_mel_call_packed(None, nfft, hop, n_mels, sample_rate,
                                    window, window_param, fmin, fmax,
                                    variant, interpret, dct_lift=d,
                                    log_eps=log_epsilon,
                                    algorithm=algorithm, x_tiled=x_tiled,
                                    n=n, valid_blocks=valid_blocks)
    return out[:, :nf, :n_mfcc]


def stft_mel_supported(nfft: int, hop: int, n: int | None = None) -> bool:
    """Geometry the fused kernel handles: pow2 nfft in [128, 2048] (VMEM
    bound: the (nfft, 128) re/im tiles plus stage temporaries), hop | nfft,
    sublane-aligned hop, and q = nfft/hop <= 128 — the framing and OLA
    lane-rolls operate in a 256-lane window, so a frame may only touch
    lanes j..j+q-1 with j < 128 (q = 256 silently wraps the roll).
    Anything else falls back to the XLA paths."""
    return (128 <= nfft <= 2048 and nfft & (nfft - 1) == 0
            and hop > 0 and nfft % hop == 0 and hop % 8 == 0
            and nfft // hop <= 128)


def _stft_mel_kernel(xt_hbm, w_ref, twr_ref, twi_ref, dp_ref, mel_ref,
                     *rest, nfft, hop, q, tk, lanes_p, n_stages, lstop,
                     fuse_mfcc=False, log_eps=0.0):
    if fuse_mfcc:
        dct_ref, out_ref, xv, sre_ref, sim_ref, sem = rest
    else:
        out_ref, xv, sre_ref, sim_ref, sem = rest
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()

    # frame tile: row r*hop+s of frame f is xt[s, f+r]; the +r lane shift is
    # a roll (DMA lane offsets must be 128-aligned, so it can't shift)
    xvv = xv[:]
    for r in range(q):
        part = xvv if r == 0 else pltpu.roll(xvv, lanes_p - r, 1)
        sre_ref[r * hop:(r + 1) * hop, :] = (
            part[:, :tk] * w_ref[r * hop:(r + 1) * hop, :])

    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages, real_input=True)

    # DFT-lstop tail on the MXU, power written in place (block b's output
    # depends only on block b's state)
    dpv = dp_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        orr, oi = o[:lstop], o[lstop:]
        sre_ref[lo:lo + lstop, :] = orr * orr + oi * oi

    mel_e = jnp.dot(mel_ref[:], sre_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
    if fuse_mfcc:
        # full MFCC tail in-kernel: log-mel -> lifted DCT-II rows (the
        # lifter weights and the zero columns masking the padded mel rows
        # are folded into the dct matrix host-side)
        lm = jnp.log(mel_e + jnp.float32(log_eps))
        mel_e = jnp.dot(dct_ref[:], lm,
                        preferred_element_type=jnp.float32,
                        precision=_kernel_precision())
    out_ref[0, :, :] = mel_e.T


def _power_kernel(xt_hbm, w_ref, twr_ref, twi_ref, dp_ref, out_ref,
                  xv, sre_ref, sim_ref, sem, *, nfft, hop, q, tk, lanes_p,
                  n_stages, lstop):
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    xvv = xv[:]
    for r in range(q):
        part = xvv if r == 0 else pltpu.roll(xvv, lanes_p - r, 1)
        sre_ref[r * hop:(r + 1) * hop, :] = (
            part[:, :tk] * w_ref[r * hop:(r + 1) * hop, :])
    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages, real_input=True)
    dpv = dp_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        orr, oi = o[:lstop], o[lstop:]
        sre_ref[lo:lo + lstop, :] = orr * orr + oi * oi
    out_ref[0, :, :] = sre_ref[:]


def stft_power_stockham(x, nfft: int, hop: int, window: str = "hann",
                        window_param=None, interpret: bool | None = None):
    """One-sided power spectrogram |rfft(w*frame)|^2 via the Stockham
    kernel: (channels, n) -> (channels, frames, nfft//2+1) in NATURAL bin
    order (the kernel's permuted rows are unpermuted by one XLA column
    gather — still ~2x the dense windowed-basis matmul path at nfft=2048).
    Matches STFT(nfft, hop, window).power(x) to f32 rounding."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_supported(nfft, hop):
        raise ValueError("unsupported geometry; check stft_mel_supported()")
    if jnp.iscomplexobj(x):
        raise TypeError("stft_power_stockham requires real input")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    tk = _pick_tk(nf, 4 * (6 * nfft + hop),
                  fixed_bytes=4 * 128 * hop + 2 ** 20)
    lstop = min(_LSTOP, nfft)
    n_stages = (nfft // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(nfft, n_stages)
    dp = _packed_dft(lstop)
    kernel = functools.partial(
        _power_kernel, nfft=nfft, hop=hop, q=q, tk=tk, lanes_p=lanes_p,
        n_stages=n_stages, lstop=lstop)
    out = pl.pallas_call(
        kernel,
        grid=(c, nf_p // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nfft, 1), lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twr.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twi.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dp.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nfft, tk), lambda c, f: (c, 0, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nfft, nf_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp))
    # natural one-sided bins, gather-free (see _stockham_natural)
    pw = jnp.swapaxes(out, -1, -2)[:, :nf, :]
    return _stockham_natural(pw, nfft, lstop, onesided=True)


def _spectrum_kernel(xt_hbm, w_ref, twr_ref, twi_ref, dp_ref, re_ref, im_ref,
                     xv, sre_ref, sim_ref, sem, *, nfft, hop, q, tk, lanes_p,
                     n_stages, lstop):
    c = pl.program_id(0)
    fbk = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    xvv = xv[:]
    for r in range(q):
        part = xvv if r == 0 else pltpu.roll(xvv, lanes_p - r, 1)
        sre_ref[r * hop:(r + 1) * hop, :] = (
            part[:, :tk] * w_ref[r * hop:(r + 1) * hop, :])
    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages, real_input=True)
    dpv = dp_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        re_ref[0, lo:lo + lstop, :] = o[:lstop]
        im_ref[0, lo:lo + lstop, :] = o[lstop:]


def stft_spectrum_stockham(x, nfft: int, hop: int, window: str = "hann",
                           window_param=None, onesided: bool = False,
                           interpret: bool | None = None):
    """Windowed complex STFT spectrum via the Stockham kernel, NATURAL bin
    order: (channels, n) real -> (channels, frames, bins) complex64 with
    bins = nfft (two-sided) or nfft//2+1 (onesided). The permuted kernel
    rows are unpermuted by one XLA column gather — the spectrum is tiny
    next to the transform work, so the gather is noise. Matches
    STFT(...).process(x) to f32 rounding."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_supported(nfft, hop):
        raise ValueError("unsupported geometry; check stft_mel_supported()")
    if jnp.iscomplexobj(x):
        raise TypeError("stft_spectrum_stockham requires real input")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    tk = _pick_tk(nf, 4 * (6 * nfft + hop),
                  fixed_bytes=4 * 128 * hop + 2 ** 20)
    lstop = min(_LSTOP, nfft)
    n_stages = (nfft // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(nfft, n_stages)
    dp = _packed_dft(lstop)
    kernel = functools.partial(
        _spectrum_kernel, nfft=nfft, hop=hop, q=q, tk=tk, lanes_p=lanes_p,
        n_stages=n_stages, lstop=lstop)
    spec = pl.BlockSpec((1, nfft, tk), lambda c, f: (c, 0, f),
                        memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        kernel,
        grid=(c, nf_p // tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nfft, 1), lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twr.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twi.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dp.shape, lambda c, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((c, nfft, nf_p), jnp.float32),
                   jax.ShapeDtypeStruct((c, nfft, nf_p), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp))
    re = _stockham_natural(jnp.swapaxes(re, -1, -2)[:, :nf, :], nfft,
                           lstop, onesided)
    im = _stockham_natural(jnp.swapaxes(im, -1, -2)[:, :nf, :], nfft,
                           lstop, onesided)
    return jax.lax.complex(re, im)


@functools.lru_cache(maxsize=4)
def _packed_idft(lstop: int, nfft: int) -> np.ndarray:
    """(2*lstop, 2*lstop) real matrix: [Ar; Ai] = Dpi @ [Sr; Si] with the
    FULL 1/nfft inverse scaling folded in (the unscaled inverse butterfly
    stages contribute the remaining 2^stages — see _inverse_stages)."""
    d = np.exp(2j * np.pi * np.outer(np.arange(lstop), np.arange(lstop))
               / lstop) / float(nfft)
    return np.block([[d.real, -d.imag],
                     [d.imag, d.real]]).astype(np.float32)


def _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, *, nfft, tk,
                    n_stages, real_input):
    """In-place DIF butterflies, span nfft down to lstop (stage s handles
    l = nfft >> s), fused in radix-4 pairs: one radix-4 pass computes the
    exact same values in the exact same positions as two radix-2 DIF stages
    (so the row->bin permutation is unchanged) but makes HALF the memory
    passes over the (nfft, tk) tiles — the stages are VPU/VMEM-bound, and
    this measured ~35% off the butterfly phase at nfft=2048.

    real_input specializes the first pass for imag == 0 (the radix-4 form
    folds stages 0+1 with real a,b,c,d when n_stages >= 2)."""
    stage = 0
    # real-input radix-4 first pass: stages 0+1 with ai=bi=ci=di=0
    if real_input and n_stages >= 2:
        h4 = nfft // 4
        v = sre_ref[:].reshape(4, h4, tk)
        ar, br, cr, dr = v[0], v[1], v[2], v[3]
        w1r = twr_ref[0, :h4].reshape(h4, 1)
        w1i = twi_ref[0, :h4].reshape(h4, 1)
        w2r = twr_ref[1, :h4].reshape(h4, 1)
        w2i = twi_ref[1, :h4].reshape(h4, 1)
        w3r = w1r * w2r - w1i * w2i
        w3i = w1r * w2i + w1i * w2r
        s0 = ar + cr
        s1 = br + dr
        t0 = ar - cr
        t1 = br - dr
        u1 = s0 - s1
        sre_ref[:, :] = jnp.stack(
            [s0 + s1, u1 * w2r, t0 * w1r + t1 * w1i,
             t0 * w3r - t1 * w3i], axis=0).reshape(nfft, tk)
        sim_ref[:, :] = jnp.stack(
            [jnp.zeros((h4, tk), jnp.float32), u1 * w2i,
             t0 * w1i - t1 * w1r, t0 * w3i + t1 * w3r],
            axis=0).reshape(nfft, tk)
        stage = 2
    elif real_input and n_stages == 1:
        h = nfft // 2
        a = sre_ref[:h, :]
        b = sre_ref[h:, :]
        wr = twr_ref[0, :h].reshape(h, 1)
        wi = twi_ref[0, :h].reshape(h, 1)
        d0 = a - b
        sre_ref[:h, :] = a + b
        sre_ref[h:, :] = d0 * wr
        sim_ref[:h, :] = jnp.zeros((h, tk), jnp.float32)
        sim_ref[h:, :] = d0 * wi
        stage = 1
    elif real_input:
        sim_ref[:, :] = jnp.zeros((nfft, tk), jnp.float32)
        stage = n_stages  # nothing else to do
    # complex radix-4 passes (stages stage, stage+1)
    while stage + 1 < n_stages:
        l = nfft >> stage
        r_ = nfft // l
        h4 = l // 4
        vr = sre_ref[:].reshape(r_, 4, h4, tk)
        vi = sim_ref[:].reshape(r_, 4, h4, tk)
        ar, br, cr, dr = vr[:, 0], vr[:, 1], vr[:, 2], vr[:, 3]
        ai, bi, ci, di = vi[:, 0], vi[:, 1], vi[:, 2], vi[:, 3]
        w1r = twr_ref[stage, :h4].reshape(1, h4, 1)
        w1i = twi_ref[stage, :h4].reshape(1, h4, 1)
        w2r = twr_ref[stage + 1, :h4].reshape(1, h4, 1)
        w2i = twi_ref[stage + 1, :h4].reshape(1, h4, 1)
        w3r = w1r * w2r - w1i * w2i
        w3i = w1r * w2i + w1i * w2r
        s0r, s0i = ar + cr, ai + ci
        s1r, s1i = br + dr, bi + di
        t0r, t0i = ar - cr, ai - ci
        t1r, t1i = br - dr, bi - di
        u1r, u1i = s0r - s1r, s0i - s1i
        u2r, u2i = t0r + t1i, t0i - t1r   # (a-c) - j(b-d)
        u3r, u3i = t0r - t1i, t0i + t1r   # (a-c) + j(b-d)
        sre_ref[:, :] = jnp.stack(
            [s0r + s1r, u1r * w2r - u1i * w2i, u2r * w1r - u2i * w1i,
             u3r * w3r - u3i * w3i], axis=1).reshape(nfft, tk)
        sim_ref[:, :] = jnp.stack(
            [s0i + s1i, u1r * w2i + u1i * w2r, u2r * w1i + u2i * w1r,
             u3r * w3i + u3i * w3r], axis=1).reshape(nfft, tk)
        stage += 2
    # trailing radix-2 stage (odd remainder)
    if stage < n_stages:
        l = nfft >> stage
        r_ = nfft // l
        h = l // 2
        vr = sre_ref[:].reshape(r_, 2, h, tk)
        vi = sim_ref[:].reshape(r_, 2, h, tk)
        ar, br = vr[:, 0], vr[:, 1]
        ai, bi = vi[:, 0], vi[:, 1]
        wr = twr_ref[stage, :h].reshape(1, h, 1)
        wi = twi_ref[stage, :h].reshape(1, h, 1)
        dr = ar - br
        di = ai - bi
        sre_ref[:, :] = jnp.stack(
            [ar + br, dr * wr - di * wi], axis=1).reshape(nfft, tk)
        sim_ref[:, :] = jnp.stack(
            [ai + bi, dr * wi + di * wr], axis=1).reshape(nfft, tk)


def _inverse_stages(sre_ref, sim_ref, twr_ref, twi_ref, *, nfft, tk,
                    n_stages):
    """Mirror of _forward_stages: for each forward stage u = a+b,
    v = (a-b)w, the unscaled inverse is a = u + v*conj(w),
    b = u - v*conj(w) (the 2^stages factor lives in _packed_idft).
    Stages run in reverse span order (l = lstop*2 up to nfft), fused in
    radix-4 pairs (the exact composition of two radix-2 inverse stages —
    half the memory passes, same values in the same positions)."""
    stage = n_stages - 1
    # trailing radix-2 when n_stages is odd (inverse of the forward's last
    # radix-2 stage, executed FIRST on the way back up)
    if n_stages % 2 == 1:
        l = nfft >> stage
        r_ = nfft // l
        h = l // 2
        vr = sre_ref[:].reshape(r_, 2, h, tk)
        vi = sim_ref[:].reshape(r_, 2, h, tk)
        ur, vr_ = vr[:, 0], vr[:, 1]
        ui, vi_ = vi[:, 0], vi[:, 1]
        wr = twr_ref[stage, :h].reshape(1, h, 1)
        wi = twi_ref[stage, :h].reshape(1, h, 1)   # forward sin; conj: -wi
        tr = vr_ * wr + vi_ * wi
        ti = vi_ * wr - vr_ * wi
        sre_ref[:, :] = jnp.stack(
            [ur + tr, ur - tr], axis=1).reshape(nfft, tk)
        sim_ref[:, :] = jnp.stack(
            [ui + ti, ui - ti], axis=1).reshape(nfft, tk)
        stage -= 1
    # radix-4 inverse passes: undo forward stages (stage-1, stage) per pass
    while stage >= 1:
        s = stage - 1          # the pair is (s, s+1); spans (nfft>>s, ...)
        l = nfft >> s
        r_ = nfft // l
        h4 = l // 4
        vr = sre_ref[:].reshape(r_, 4, h4, tk)
        vi = sim_ref[:].reshape(r_, 4, h4, tk)
        o0r, o1r, o2r, o3r = vr[:, 0], vr[:, 1], vr[:, 2], vr[:, 3]
        o0i, o1i, o2i, o3i = vi[:, 0], vi[:, 1], vi[:, 2], vi[:, 3]
        w1r = twr_ref[s, :h4].reshape(1, h4, 1)
        w1i = twi_ref[s, :h4].reshape(1, h4, 1)
        w2r = twr_ref[s + 1, :h4].reshape(1, h4, 1)
        w2i = twi_ref[s + 1, :h4].reshape(1, h4, 1)
        # x*conj(w): re = xr*wr + xi*wi, im = xi*wr - xr*wi
        a1r = o1r * w2r + o1i * w2i
        a1i = o1i * w2r - o1r * w2i
        a3r = o3r * w2r + o3i * w2i
        a3i = o3i * w2r - o3r * w2i
        g0r, g0i = o0r + a1r, o0i + a1i       # 2(a+c)
        g1r, g1i = o0r - a1r, o0i - a1i       # 2(b+d)
        pr, pi = o2r + a3r, o2i + a3i         # 2 w1 (a-c)
        qr, qi = o2r - a3r, o2i - a3i         # -2j w1 (b-d)
        pwr = pr * w1r + pi * w1i             # 2(a-c)
        pwi = pi * w1r - pr * w1i
        qwr = qr * w1r + qi * w1i             # -2j(b-d)
        qwi = qi * w1r - qr * w1i
        qjr, qji = -qwi, qwr                  # j * qw = 2(b-d)
        sre_ref[:, :] = jnp.stack(
            [g0r + pwr, g1r + qjr, g0r - pwr, g1r - qjr],
            axis=1).reshape(nfft, tk)
        sim_ref[:, :] = jnp.stack(
            [g0i + pwi, g1i + qji, g0i - pwi, g1i - qji],
            axis=1).reshape(nfft, tk)
        stage -= 2


def stft_gate_packed_supported(nfft: int, hop: int) -> bool:
    """Geometry for the packed-real fused gate kernel (see
    stft_mel_packed_supported; the gate additionally needs hop < nfft for
    OLA coverage)."""
    return stft_mel_packed_supported(nfft, hop) and hop < nfft


def _gate_packed_kernel(xt_hbm, we_ref, wo_ref, w_ref, twr_ref, twi_ref,
                        dp_ref, dpr_ref, dpr0_ref, dpi_ref, dpir_ref,
                        p0_ref, pr_ref, wkr_ref, wki_ref, out_ref,
                        spill_ref, xv, zre, zim, xre, xim, sem, *, m, nfft,
                        mhop, hop, q, tk, sw, lanes_p, n_stages, lstop,
                        selfs, crosses, thresh2, algorithm):
    c = pl.program_id(0)
    st = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xt_hbm.at[c, :, pl.ds(st * tk, lanes_p)], xv, sem)
    dma.start()
    dma.wait()
    v = xv[:].reshape(mhop, 2, lanes_p)
    xevv = v[:, 0, :]
    xovv = v[:, 1, :]
    for r in range(q):
        pe = xevv if r == 0 else pltpu.roll(xevv, lanes_p - r, 1)
        po = xovv if r == 0 else pltpu.roll(xovv, lanes_p - r, 1)
        zre[r * mhop:(r + 1) * mhop, :] = (
            pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
        zim[r * mhop:(r + 1) * mhop, :] = (
            po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])
    _forward_stages(zre, zim, twr_ref, twi_ref, nfft=m, tk=tk,
                    n_stages=n_stages, real_input=False)
    # forward unpack to one-sided X in packed storage (xre/xim, nyq row m)
    _packed_tail_spectrum(zre, zim, xre, xim, dp_ref, dpr_ref, dpr0_ref,
                          wkr_ref, wki_ref, m=m, tk=tk, lstop=lstop,
                          selfs=selfs, crosses=crosses, algorithm=algorithm)
    # spectral gate: per-frame peak over the one-sided powers (the mirror
    # bins m+1..nfft-1 share magnitudes with 1..m-1, so the one-sided max
    # IS the two-sided max); mask X in place
    p2 = xre[:m + 1, :] * xre[:m + 1, :] + xim[:m + 1, :] * xim[:m + 1, :]
    peak2 = jnp.max(p2, axis=0, keepdims=True)
    keep = p2 >= jnp.float32(thresh2) * peak2
    zero = jnp.zeros((m + 1, tk), jnp.float32)
    xre[:m + 1, :] = jnp.where(keep, xre[:m + 1, :], zero)
    xim[:m + 1, :] = jnp.where(keep, xim[:m + 1, :], zero)
    # Hermitian repack + m-point inverse (shared with istft_packed)
    _packed_repack_inverse(xre, xim, zre, zim, dpi_ref, dpir_ref, p0_ref,
                           pr_ref, wkr_ref, wki_ref, twr_ref, twi_ref,
                           m=m, tk=tk, lstop=lstop, n_stages=n_stages,
                           selfs=selfs, crosses=crosses, algorithm=algorithm)
    # interleave, synthesis window, OLA into owned strip + spill
    y = jnp.stack([zre[:], zim[:]], axis=1).reshape(nfft, tk)
    acc = _ola_accumulate(y, w_ref, nfft=nfft, hop=hop, q=q, tk=tk, sw=sw)
    out_ref[0, 0, :, :] = acc[:, :tk]
    spill_ref[0, 0, :, :] = acc[:, tk:]


def stft_gate_packed(x, nfft: int, hop: int, threshold: float,
                     window: str = "hann", window_param=None,
                     interpret: bool | None = None,
                     algorithm: str | None = None):
    """Fused STFT -> spectral gate -> ISTFT on the PACKED-REAL tiers:
    forward and inverse both run m = nfft/2 complex FFTs (paired-row
    Hermitian unpack / repack), halving the butterfly and tail work of
    stft_gate_pallas.  Same semantics: x is COLA-coverage padded by the
    caller; every output sample in [nfft-hop, n-(nfft-hop)) is exact vs
    the staged parts path."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_gate_packed_supported(nfft, hop):
        raise ValueError("unsupported geometry; "
                         "check stft_gate_packed_supported()")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    # round-5: the strip restructure (one-lane-tile spill instead of the
    # full-tk mirror) removed the inverse half's tile-width penalty; byte
    # model covers xv + fwd/inv scratch + full-tile stage temporaries
    m_pad = m + 8
    tk = _pick_tk(nf, 4 * (4 * m + 2 * m_pad + 3 * hop),
                  fixed_bytes=4 * (128 * hop + 2 * 128 * hop) + 2 ** 20,
                  cap=512)
    sw = _round_up(max(q - 1, 1), 128)
    lstop = min(_LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = _stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = _packed_tail_mats(lstop)
    dpi = _packed_idft(lstop, m)
    dpir = _packed_idft_rev(lstop, m)
    p0, pr = _packed_self_perms(lstop)
    wkr, wki = _packed_wk(nfft, lstop)
    selfs, crosses, _ = _packed_pair_plan(m, lstop)
    m_pad = m + 8
    steps = nf_p // tk

    kernel = functools.partial(
        _gate_packed_kernel, m=m, nfft=nfft, mhop=mhop, hop=hop, q=q, tk=tk,
        sw=sw, lanes_p=lanes_p, n_stages=n_stages, lstop=lstop,
        selfs=tuple(selfs), crosses=tuple(crosses),
        thresh2=float(threshold) * float(threshold),
        algorithm=_dot_algorithm(algorithm))
    const = lambda shape: pl.BlockSpec(shape, lambda c, s: (0, 0),
                                       memory_space=pltpu.VMEM)
    main, spill = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            const((m, 1)), const((m, 1)), const((nfft, 1)),
            const(twr.shape), const(twi.shape), const(dp.shape),
            const(dpr.shape), const(dpr0.shape), const(dpi.shape),
            const(dpir.shape), const(p0.shape), const(pr.shape),
            const((m, 1)), const((m, 1)),
        ],
        out_specs=(pl.BlockSpec((1, 1, hop, tk), lambda c, s: (c, s, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, hop, sw), lambda c, s: (c, s, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((c, steps, hop, tk), jnp.float32),
                   jax.ShapeDtypeStruct((c, steps, hop, sw), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m, tk), jnp.float32),
            pltpu.VMEM((m_pad, tk), jnp.float32),
            pltpu.VMEM((m_pad, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, jnp.asarray(we), jnp.asarray(wo),
      jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
      jnp.asarray(dpr0), jnp.asarray(dpi), jnp.asarray(dpir),
      jnp.asarray(p0), jnp.asarray(pr), jnp.asarray(wkr),
      jnp.asarray(wki))

    # interior-periodic w^2 OLA norm (exact for every retained sample —
    # the caller's COLA pad absorbs the edges)
    wsq = w_np.astype(np.float64) ** 2
    norm_np = np.zeros(hop, np.float64)
    for r in range(q):
        norm_np += wsq[r * hop:(r + 1) * hop]
    norm_np = np.where(norm_np > 1e-12, norm_np, 1.0)
    reps = -(-n // hop)
    norm = jnp.asarray(np.tile(norm_np, reps)[:n].astype(np.float32))
    return _ola_strips_epilogue(main, spill, c, steps, tk, hop, q, n, norm)


def stft_gate_split(x, nfft: int, hop: int, threshold: float,
                    window: str = "hann", window_param=None,
                    interpret: bool | None = None,
                    algorithm: str | None = None):
    """SpectralGate as the SPLIT pair: packed spectrum kernel -> HBM
    storage planes -> inverse kernel with the per-frame peak mask applied
    in-VMEM (gate_threshold).  Measured FASTER than the single fused gate
    kernel at 1024/256 x 16ch x 479k on v5e (the fused form serializes
    forward+inverse compute per tile and loses cross-kernel pipelining;
    the spectrum round trip through HBM costs less).  Same retained-sample
    semantics as stft_gate_packed: the caller COLA-pads and slices."""
    if jnp.iscomplexobj(x):
        raise TypeError("real input required")
    ps = stft_spectrum_packed_raw(x, nfft, hop, window, window_param,
                                  interpret, algorithm)
    return istft_packed_from_storage(ps, x.shape[-1], window, window_param,
                                     interpret, algorithm,
                                     gate_threshold=threshold)


def stft_gate_supported(nfft: int, hop: int) -> bool:
    """Geometry the fused gate kernel handles (see stft_mel_supported; the
    gate additionally needs hop < nfft so OLA has coverage)."""
    return stft_mel_supported(nfft, hop) and hop < nfft


def _gate_kernel(xt_hbm, w_ref, twr_ref, twi_ref, dp_ref, dpi_ref, out_ref,
                 sre_ref, sim_ref, sem, *, nfft, hop, q, tk, lanes_p,
                 n_stages, lstop, thresh2):
    c = pl.program_id(0)
    st = pl.program_id(1)

    def body(xv):
        dma = pltpu.make_async_copy(
            xt_hbm.at[c, :, pl.ds(st * tk, lanes_p)], xv, sem)
        dma.start()
        dma.wait()
        xvv = xv[:]
        for r in range(q):
            part = xvv if r == 0 else pltpu.roll(xvv, lanes_p - r, 1)
            sre_ref[r * hop:(r + 1) * hop, :] = (
                part[:, :tk] * w_ref[r * hop:(r + 1) * hop, :])

    pl.run_scoped(body, pltpu.VMEM((hop, lanes_p), jnp.float32))

    _forward_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages, real_input=True)
    # forward DFT-lstop tail, spectrum kept as (re, im)
    dpv = dp_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        sre_ref[lo:lo + lstop, :] = o[:lstop]
        sim_ref[lo:lo + lstop, :] = o[lstop:]

    # spectral gate in permuted bin space: the per-frame peak is a
    # permutation-invariant row reduction, the mask is pointwise
    # (src/models SpectralGate: mag >= t*peak <=> mag^2 >= t^2*peak^2)
    p2 = sre_ref[:] * sre_ref[:] + sim_ref[:] * sim_ref[:]
    peak2 = jnp.max(p2, axis=0, keepdims=True)
    keep = p2 >= jnp.float32(thresh2) * peak2
    zero = jnp.zeros((nfft, tk), jnp.float32)
    sre_ref[:, :] = jnp.where(keep, sre_ref[:], zero)
    sim_ref[:, :] = jnp.where(keep, sim_ref[:], zero)

    # inverse: iDFT-lstop (1/nfft folded), then mirrored butterflies
    dpiv = dpi_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpiv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        sre_ref[lo:lo + lstop, :] = o[:lstop]
        sim_ref[lo:lo + lstop, :] = o[lstop:]
    _inverse_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages)

    # synthesis window + OLA into a 2*tk-lane strip: frame at lane j spans
    # output hop-blocks j..j+q-1 -> contribution r rides a lane roll by +r
    y = sre_ref[:] * w_ref[:]
    acc = jnp.zeros((hop, 2 * tk), jnp.float32)
    for r in range(q):
        part = jnp.pad(y[r * hop:(r + 1) * hop, :], ((0, 0), (0, tk)))
        acc = acc + (part if r == 0 else pltpu.roll(part, r, 1))
    out_ref[0, 0, :, :] = acc


def stft_gate_pallas(x, nfft: int, hop: int, threshold: float,
                     window: str = "hann", window_param=None,
                     interpret: bool | None = None):
    """Fused STFT -> per-frame spectral magnitude gate -> ISTFT with
    w^2-normalized OLA, one kernel pass (the SpectralGate pipeline body,
    reference bench/bench_pipeline.c:77-120).

    x: (channels, n) REAL, already COLA-coverage padded by the caller
    (models.SpectralGate pads nfft-hop zeros per side); every output sample
    in [nfft-hop, n-(nfft-hop)) is exact vs the staged parts path; the pad
    regions (discarded by the caller) use the interior-periodic w^2 norm
    and phantom zero frames, so they differ there by design."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_gate_supported(nfft, hop):
        raise ValueError("unsupported geometry; check stft_gate_supported()")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c, n = x.shape
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    tk = _TK   # fused fwd+inv: the inverse half's strip economics dominate
    lstop = min(_LSTOP, nfft)
    n_stages = (nfft // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)  # (c, hop, nb)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(nfft, n_stages)
    dp = _packed_dft(lstop)
    dpi = _packed_idft(lstop, nfft)
    steps = nf_p // tk

    kernel = functools.partial(
        _gate_kernel, nfft=nfft, hop=hop, q=q, tk=tk, lanes_p=lanes_p,
        n_stages=n_stages, lstop=lstop,
        thresh2=float(threshold) * float(threshold))
    strips = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nfft, 1), lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twr.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twi.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dp.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dpi.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hop, 2 * tk),
                               lambda c, s: (c, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, steps, hop, 2 * tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpi))

    # merge strips: strip s covers hop-blocks [s*tk, s*tk + 2*tk); adjacent
    # strips overlap tk blocks -> one shifted add
    strips = jnp.swapaxes(strips, -1, -2)  # (c, steps, 2*tk, hop)
    main = strips[:, :, :tk, :].reshape(c, steps * tk * hop)
    spill = strips[:, :, tk:, :].reshape(c, steps * tk * hop)
    recon = main + jnp.pad(spill, ((0, 0), (tk * hop, 0)))[:, :steps * tk * hop]

    # interior-periodic w^2 OLA norm (exact for every retained sample)
    wsq = w_np.astype(np.float64) ** 2
    norm_np = np.zeros(hop, np.float64)
    for r in range(q):
        norm_np += wsq[r * hop:(r + 1) * hop]
    norm = jnp.asarray(np.where(norm_np > 1e-12, norm_np, 1.0)
                       .astype(np.float32))
    recon = recon.reshape(c, steps * tk, hop) / norm
    return recon.reshape(c, steps * tk * hop)[:, :n]


def _istft_kernel(re_hbm, im_hbm, w_ref, twr_ref, twi_ref, dpi_ref, out_ref,
                  sre_ref, sim_ref, sems, *, nfft, hop, q, tk, n_stages,
                  lstop):
    c = pl.program_id(0)
    st = pl.program_id(1)
    d1 = pltpu.make_async_copy(
        re_hbm.at[c, :, pl.ds(st * tk, tk)], sre_ref, sems.at[0])
    d2 = pltpu.make_async_copy(
        im_hbm.at[c, :, pl.ds(st * tk, tk)], sim_ref, sems.at[1])
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()
    dpiv = dpi_ref[:]
    for b_ in range(nfft // lstop):
        lo = b_ * lstop
        packed = jnp.concatenate(
            [sre_ref[lo:lo + lstop, :], sim_ref[lo:lo + lstop, :]], axis=0)
        o = jnp.dot(dpiv, packed, preferred_element_type=jnp.float32,
                    precision=_kernel_precision())
        sre_ref[lo:lo + lstop, :] = o[:lstop]
        sim_ref[lo:lo + lstop, :] = o[lstop:]
    _inverse_stages(sre_ref, sim_ref, twr_ref, twi_ref, nfft=nfft, tk=tk,
                    n_stages=n_stages)
    y = sre_ref[:] * w_ref[:]
    acc = jnp.zeros((hop, 2 * tk), jnp.float32)
    for r in range(q):
        part = jnp.pad(y[r * hop:(r + 1) * hop, :], ((0, 0), (0, tk)))
        acc = acc + (part if r == 0 else pltpu.roll(part, r, 1))
    out_ref[0, 0, :, :] = acc


@functools.lru_cache(maxsize=32)
def _ola_norm_table(nfft: int, hop: int, nf: int, output_len: int,
                    window: str, window_param) -> np.ndarray:
    """w^2 overlap-add norm over nf frames (guarded), vectorized: q block
    placements of an (nf, hop) broadcast instead of an O(nf*nfft) Python
    loop (which cost hundreds of host ms per retrace at small hops)."""
    from vv_dsp_tpu.ops.window import get_window_np

    wsq = get_window_np(window, nfft, window_param).astype(np.float64) ** 2
    q = nfft // hop
    blocks = nf + q - 1
    acc = np.zeros((blocks, hop), np.float64)
    for r in range(q):
        acc[r: r + nf] += wsq[r * hop: (r + 1) * hop][None, :]
    flat = acc.reshape(blocks * hop)
    if output_len > flat.shape[0]:
        flat = np.pad(flat, (0, output_len - flat.shape[0]))
    flat = flat[:output_len]
    return np.where(flat > 1e-12, flat, 1.0).astype(np.float32)


def istft_stockham(spec, nfft: int, hop: int, output_len: int,
                   window: str = "hann", window_param=None,
                   rfft: bool = False, interpret: bool | None = None):
    """Inverse STFT with w^2-normalized overlap-add via the inverse
    Stockham kernel: spec (channels, frames, bins) complex (bins = nfft, or
    nfft//2+1 Hermitian-packed with rfft=True) -> (channels, output_len).
    Matches STFT(...).reconstruct to f32 rounding INCLUDING the reference's
    partial-coverage edge norm (tools/dump_stft_roundtrip.c:50-54): the
    exact overlap-add w^2 norm for this (frames, output_len) is built
    host-side and divided out after the kernel."""
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_supported(nfft, hop):
        raise ValueError("unsupported geometry; check stft_mel_supported()")
    if spec.ndim != 3:
        raise ValueError("expected (channels, frames, bins)")
    c, nf, bins = spec.shape
    q = nfft // hop
    tk = _TK   # inverse kernels regress with wider tiles (see istft_packed)
    lstop = min(_LSTOP, nfft)
    n_stages = (nfft // lstop).bit_length() - 1

    # permuted full-spectrum rows from the (possibly Hermitian-packed)
    # input: row p holds bin b = perm[p]; for packed input, bins above
    # nfft//2 come from the conjugate mirror
    if rfft:
        if bins != nfft // 2 + 1:
            raise ValueError("rfft=True expects nfft//2+1 bins")
        re_n = _stockham_storage_from_natural(jnp.real(spec), nfft, lstop,
                                              True, False)
        im_n = _stockham_storage_from_natural(jnp.imag(spec), nfft, lstop,
                                              True, True)
    else:
        if bins != nfft:
            raise ValueError("rfft=False expects nfft bins")
        re_n = _stockham_storage_from_natural(jnp.real(spec), nfft, lstop,
                                              False, False)
        im_n = _stockham_storage_from_natural(jnp.imag(spec), nfft, lstop,
                                              False, False)
    re_n = re_n.astype(jnp.float32)
    im_n = im_n.astype(jnp.float32)

    # +tk: the final frames' OLA spill must land in a kept strip
    nf_p = _round_up(nf, tk) + tk
    re_t = jnp.swapaxes(jnp.pad(re_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                        -1, -2)  # (c, nfft, nf_p)
    im_t = jnp.swapaxes(jnp.pad(im_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                        -1, -2)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(nfft, n_stages)
    dpi = _packed_idft(lstop, nfft)
    steps = nf_p // tk
    kernel = functools.partial(
        _istft_kernel, nfft=nfft, hop=hop, q=q, tk=tk, n_stages=n_stages,
        lstop=lstop)
    strips = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((nfft, 1), lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twr.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(twi.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dpi.shape, lambda c, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hop, 2 * tk),
                               lambda c, s: (c, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, steps, hop, 2 * tk), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(re_t, im_t, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dpi))

    strips = jnp.swapaxes(strips, -1, -2)
    main = strips[:, :, :tk, :].reshape(c, steps * tk * hop)
    spill = strips[:, :, tk:, :].reshape(c, steps * tk * hop)
    recon = main + jnp.pad(spill, ((0, 0), (tk * hop, 0)))[:, :steps * tk
                                                           * hop]
    total = steps * tk * hop
    if output_len > total:
        recon = jnp.pad(recon, ((0, 0), (0, output_len - total)))
    recon = recon[:, :output_len]

    # exact reference norm: w^2 overlap-added over the REAL frames only,
    # with the >1e-12 guard (partial coverage at the edges preserved)
    norm = jnp.asarray(_ola_norm_table(nfft, hop, nf, output_len, window,
                                       window_param))
    return recon / norm


def _stft_mel_call(x, nfft, hop, n_mels, sample_rate, window, window_param,
                   fmin, fmax, variant, interpret, dct_lift=None,
                   log_eps=0.0):
    from vv_dsp_tpu.ops.window import get_window_np

    if interpret is None:
        interpret = not _on_tpu()
    if not stft_mel_supported(nfft, hop):
        raise ValueError("unsupported geometry; check stft_mel_supported()")
    if jnp.iscomplexobj(x):
        raise TypeError("real input required")
    if x.ndim != 2:
        raise ValueError("expected (channels, n)")
    x = config.as_compute(x)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    if fmax is None:
        fmax = sample_rate / 2.0

    c, n = x.shape
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    # caps measured on hardware (the unpacked path only runs below the
    # packed kernel's floor: hop = 8 at nfft in [256, 2048], plus
    # nfft = 128 with any hop — wider hops at pow2 nfft >= 256 are
    # multiples of 16 and take the packed kernel; the nfft = 128
    # geometries' tiles are tiny, far from any cap): at nfft = 1024 the
    # full-nfft scratch + mel stage OOMs Mosaic's scoped VMEM at every
    # tk >= 384 (26.9 MB measured at 640 — a LATENT pre-round-4 bug,
    # the old uncapped pick was 512 and had never been compiled on a
    # chip); tk = 256 compiles and matches (5.3e-7).  nfft <= 512
    # verified clean through 768.
    tk = _pick_tk(nf, 4 * (2 * nfft + 4 * 128 + hop),
                  fixed_bytes=4 * 128 * hop + 2 ** 20,
                  cap=768 if nfft <= 512 else 256)
    lstop = min(_LSTOP, nfft)
    n_stages = (nfft // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)  # (c, hop, nb)

    w_np = get_window_np(window, nfft, window_param).astype(np.float32)
    twr, twi = _stage_twiddles(nfft, n_stages)
    dp = _packed_dft(lstop)
    melm = _folded_mel_matrix(nfft, n_mels, float(sample_rate), float(fmin),
                              float(fmax), variant, lstop)
    mels_p = melm.shape[0]
    fuse = dct_lift is not None

    kernel = functools.partial(
        _stft_mel_kernel, nfft=nfft, hop=hop, q=q, tk=tk, lanes_p=lanes_p,
        n_stages=n_stages, lstop=lstop, fuse_mfcc=fuse,
        log_eps=float(log_eps))
    const = lambda shape: pl.BlockSpec(shape, lambda c, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        const((nfft, 1)), const(twr.shape), const(twi.shape),
        const(dp.shape), const(melm.shape),
    ]
    args = [xt, jnp.asarray(w_np.reshape(nfft, 1)), jnp.asarray(twr),
            jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(melm)]
    if fuse:
        in_specs.append(const(dct_lift.shape))
        args.append(jnp.asarray(dct_lift))
    out = pl.pallas_call(
        kernel,
        grid=(c, nf_p // tk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tk, mels_p), lambda c, f: (c, f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nf_p, mels_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hop, lanes_p), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.VMEM((nfft, tk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return out, nf


def stft_mel_energies_pallas(x, nfft: int, hop: int, n_mels: int,
                             sample_rate: float, window: str = "hann",
                             window_param=None, fmin: float = 0.0,
                             fmax: float | None = None,
                             variant: str = "htk",
                             interpret: bool | None = None,
                             algorithm: str | None = None):
    """Fused STFT power -> mel energies: (channels, n) real ->
    (channels, frames, n_mels) f32. Numerically equivalent (f32 rounding) to
    mel_energies_from_power_parts(*STFT(...).power_parts(x), ...); frame
    count and tail zero-padding match STFT.num_frames / spectrogram
    (src/spectral/stft.c:118,124-137).

    Dispatch: the packed-real kernel (m = nfft/2 complex FFT + Hermitian
    pair unpack — ~1.3x faster at the flagship geometry and it extends
    coverage to nfft 4096) when the geometry allows, else the plain
    full-nfft Stockham kernel."""
    if stft_mel_packed_supported(nfft, hop):
        out, nf = _stft_mel_call_packed(x, nfft, hop, n_mels, sample_rate,
                                        window, window_param, fmin, fmax,
                                        variant, interpret,
                                        algorithm=algorithm)
    else:
        out, nf = _stft_mel_call(x, nfft, hop, n_mels, sample_rate, window,
                                 window_param, fmin, fmax, variant,
                                 interpret)
    return out[:, :nf, :n_mels]


def stft_mfcc_pallas(x, nfft: int, hop: int, n_mels: int, n_mfcc: int,
                     sample_rate: float, window: str = "hann",
                     window_param=None, fmin: float = 0.0,
                     fmax: float | None = None, log_epsilon: float = 1e-10,
                     lifter: float = 0.0, variant: str = "htk",
                     interpret: bool | None = None,
                     algorithm: str | None = None):
    """The FULL MFCC pipeline in one kernel pass: STFT power -> mel ->
    log -> lifted DCT-II, nothing but the signal read and the
    (frames, n_mfcc) write in HBM. Matches mfcc_from_power_parts(...)
    (log/DCT in f32)."""
    from vv_dsp_tpu.ops.dct import _dct2_matrix
    from vv_dsp_tpu.ops.mel import _lifter_np

    mels_p = _round_up(n_mels, 128)
    d = np.zeros((mels_p, mels_p), np.float32)
    dm = _dct2_matrix(n_mels)[:n_mfcc] * _lifter_np(n_mfcc,
                                                    float(lifter))[:, None]
    d[:n_mfcc, :n_mels] = dm.astype(np.float32)
    if stft_mel_packed_supported(nfft, hop):
        out, nf = _stft_mel_call_packed(x, nfft, hop, n_mels, sample_rate,
                                        window, window_param, fmin, fmax,
                                        variant, interpret, dct_lift=d,
                                        log_eps=log_epsilon,
                                        algorithm=algorithm)
    else:
        out, nf = _stft_mel_call(x, nfft, hop, n_mels, sample_rate, window,
                                 window_param, fmin, fmax, variant,
                                 interpret, dct_lift=d, log_eps=log_epsilon)
    return out[:, :nf, :n_mfcc]
