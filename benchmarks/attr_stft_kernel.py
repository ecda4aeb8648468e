"""Stage attribution for the packed-real fused STFT->mel->MFCC kernel.

Builds cumulative variants of the kernel (prologue / +butterflies / +tail
powers / +mel / +DCT) at the north-star chain's STFT geometry and times
each with the chained fori_loop harness, so the per-phase cost (DMA+frame
assembly, VPU butterfly passes, MXU DFT-lstop tail, mel projection, DCT)
can be read off by differencing.  Diagnostic tool for kernel work — not
part of the committed artifact set.

Run: python benchmarks/attr_stft_kernel.py [--algorithm bf16x3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithm", default="bf16x3")
    ap.add_argument("--nfft", type=int, default=2048)
    ap.add_argument("--hop", type=int, default=512)
    ap.add_argument("--n", type=int, default=638976)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops import mel as _mel
    from vv_dsp_tpu.ops.dct import _dct2_matrix
    from vv_dsp_tpu.ops.mel import _lifter_np
    from vv_dsp_tpu.ops.pallas_kernels import dot_alg, _round_up
    from vv_dsp_tpu.ops.window import get_window_np
    from vv_dsp_tpu.utils.profiling import chain_benchmark

    nfft, hop = args.nfft, args.hop
    c, n = args.channels, args.n
    n_mels, n_mfcc, sr = 80, 20, 64000.0
    alg = args.algorithm

    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    tk = pf._pick_tk(nf, 4 * (2 * m + 4 * 128 + hop),
                     fixed_bytes=4 * 128 * hop + 2 ** 20, cap=640)
    lstop = min(pf._LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    lanes_p = _round_up(tk + q - 1, 128)
    nf_p = _round_up(nf, tk)
    nb = nf_p - tk + lanes_p
    print(f"# geometry: m={m} q={q} tk={tk} lanes_p={lanes_p} nf={nf} "
          f"nf_p={nf_p} n_stages={n_stages} lstop={lstop} alg={alg}",
          flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, n)), dtype=jnp.float32)

    w_np = get_window_np("hann", nfft, None).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = pf._stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = pf._packed_tail_mats(lstop)
    wkr, wki = pf._packed_wk(nfft, lstop)
    selfs, crosses, _ = pf._packed_pair_plan(m, lstop)
    melm, nyqcol = pf._mel_matrix_packed(nfft, n_mels, sr, 0.0, sr / 2.0,
                                         "htk", lstop)
    mels_p = melm.shape[0]
    d = np.zeros((mels_p, mels_p), np.float32)
    dm = _dct2_matrix(n_mels)[:n_mfcc] * _lifter_np(n_mfcc, 0.0)[:, None]
    d[:n_mfcc, :n_mels] = dm.astype(np.float32)

    def make_variant(stop):
        def kern(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref, dp_ref, dpr_ref,
                 dpr0_ref, wkr_ref, wki_ref, mel_ref, nyq_ref, dct_ref,
                 out_ref, xv, sre_ref, sim_ref, sem):
            cc = pl.program_id(0)
            fbk = pl.program_id(1)
            dma = pltpu.make_async_copy(
                xt_hbm.at[cc, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
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
            if stop >= 1:
                pf._forward_stages(sre_ref, sim_ref, twr_ref, twi_ref,
                                   nfft=m, tk=tk, n_stages=n_stages,
                                   real_input=False)
            nyq_row = None
            if stop >= 2:
                nyq_row = pf._packed_tail_power(
                    sre_ref, sim_ref, dp_ref, dpr_ref, dpr0_ref, wkr_ref,
                    wki_ref, m=m, tk=tk, lstop=lstop, selfs=tuple(selfs),
                    crosses=tuple(crosses), algorithm=alg)
            if stop >= 3:
                mel_e = dot_alg(mel_ref[:], sre_ref[:], alg)
                mel_e = mel_e + nyq_ref[:] * nyq_row
                if stop >= 4:
                    lm = jnp.log(mel_e + jnp.float32(1e-10))
                    mel_e = dot_alg(dct_ref[:], lm, alg)
                out_ref[0, :, :] = mel_e[:8, :] + sre_ref[:8, :] * 0.0
            else:
                out_ref[0, :, :] = sre_ref[:8, :] + sim_ref[:8, :]
        return kern

    const = lambda shape: pl.BlockSpec(shape, lambda cc, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        const((m, 1)), const((m, 1)), const(twr.shape), const(twi.shape),
        const(dp.shape), const(dpr.shape), const(dpr0.shape),
        const((m, 1)), const((m, 1)), const(melm.shape), const(nyqcol.shape),
        const(d.shape),
    ]
    consts = [jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
              jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
              jnp.asarray(dpr0), jnp.asarray(wkr), jnp.asarray(wki),
              jnp.asarray(melm), jnp.asarray(nyqcol), jnp.asarray(d)]

    def build(stop):
        call = pl.pallas_call(
            make_variant(stop),
            grid=(c, nf_p // tk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8, tk), lambda cc, f: (cc, 0, f),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, 8, nf_p), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((hop, lanes_p), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )

        def run(xv):
            xp = jnp.pad(xv, ((0, 0), (0, nb * hop - n)))
            xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)
            return call(xt, *consts)
        return run

    names = ["0 prologue (tiling+DMA+deinterleave+window)",
             "1 +butterfly stages", "2 +DFT-lstop tail powers",
             "3 +mel projection", "4 +log+DCT"]
    prev = 0.0
    results = {}
    for stop, name in enumerate(names):
        run = build(stop)
        r = chain_benchmark(f"attr[{name}]", lambda v, acc: jnp.sum(
            run(v + acc * 1e-30)).astype(jnp.float32) * 1e-30,
            x, n_samples=c * n, iters=args.iters)
        ms = r.elapsed_ms
        results[name] = ms
        print(json.dumps({"variant": name, "ms": round(ms, 3),
                          "delta_ms": round(ms - prev, 3)}), flush=True)
        prev = ms

    # full public path for reference
    full = lambda v, acc: jnp.sum(_mel.mfcc_stft(
        v + acc * 1e-30, nfft, hop, n_mels, n_mfcc, sr,
        algorithm=alg)).astype(jnp.float32) * 1e-30
    r = chain_benchmark("mfcc_stft public", full, x, n_samples=c * n,
                        iters=args.iters)
    print(json.dumps({"variant": "public mfcc_stft", "ms":
                      round(r.elapsed_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
