"""Round-5 bounded experiment for the 2048/4096 spectrum rows: the round-4
budget experiment showed tk=512 at nfft=2048 is ~24% faster but OOMs
Mosaic's scoped VMEM non-deterministically with double-buffered
(m_pad, tk) re/im output blocks.  This variant writes the outputs with
MANUAL single-buffered DMAs (HBM out refs + async copy, waiting for the
previous step's write before reusing the scratch) — saving the
2 x m_pad x tk x 4B second output buffer and bringing tk=512 under the
safe budget.

Compares: production stft_spectrum_packed vs the manual-out variant at
tk=384 (production pick) and tk=512, at nfft=2048/hop=512 and
4096/1024.  Diagnostic tool — not part of the committed artifact set.
Run: python benchmarks/attr_spectrum_manual_out.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def manual_out_call(x, nfft, hop, tk, window="hann"):
    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.pallas_kernels import _round_up
    from vv_dsp_tpu.ops.window import get_window_np

    m = nfft // 2
    mhop = hop // 2
    q = nfft // hop
    c, n = x.shape
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    lstop = min(pf._LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    nf_p = _round_up(nf, tk)
    lanes_p = _round_up(tk + q - 1, 128)
    nb = nf_p - tk + lanes_p
    xp = jnp.pad(x, ((0, 0), (0, nb * hop - n)))
    xt = jnp.swapaxes(xp.reshape(c, nb, hop), -1, -2)

    w_np = get_window_np(window, nfft, None).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = pf._stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = pf._packed_tail_mats(lstop)
    wkr, wki = pf._packed_wk(nfft, lstop)
    selfs, crosses, _ = pf._packed_pair_plan(m, lstop)
    m_pad = m + 8
    steps = nf_p // tk

    def kernel(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref, dp_ref, dpr_ref,
               dpr0_ref, wkr_ref, wki_ref, ore_hbm, oim_hbm, xv, sre, sim,
               obr, obi, sem, osem):
        cc = pl.program_id(0)
        fbk = pl.program_id(1)
        first = jnp.logical_and(cc == 0, fbk == 0)
        dma = pltpu.make_async_copy(
            xt_hbm.at[cc, :, pl.ds(fbk * tk, lanes_p)], xv, sem)
        dma.start()
        dma.wait()
        v = xv[:].reshape(mhop, 2, lanes_p)
        xe, xo = v[:, 0, :], v[:, 1, :]
        for r in range(q):
            pe = xe if r == 0 else pltpu.roll(xe, lanes_p - r, 1)
            po = xo if r == 0 else pltpu.roll(xo, lanes_p - r, 1)
            sre[r * mhop:(r + 1) * mhop, :] = (
                pe[:, :tk] * we_ref[r * mhop:(r + 1) * mhop, :])
            sim[r * mhop:(r + 1) * mhop, :] = (
                po[:, :tk] * wo_ref[r * mhop:(r + 1) * mhop, :])
        pf._forward_stages(sre, sim, twr_ref, twi_ref, nfft=m, tk=tk,
                           n_stages=n_stages, real_input=False)
        # wait for the PREVIOUS step's output writes before overwriting
        # (same-shape descriptor -> same semaphore byte count)
        @pl.when(jnp.logical_not(first))
        def _():
            pc = cc - jnp.where(fbk == 0, 1, 0)
            pfb = jnp.where(fbk == 0, steps - 1, fbk - 1)
            pltpu.make_async_copy(
                obr, ore_hbm.at[pc, :, pl.ds(pfb * tk, tk)],
                osem.at[0]).wait()
            pltpu.make_async_copy(
                obi, oim_hbm.at[pc, :, pl.ds(pfb * tk, tk)],
                osem.at[1]).wait()
        pf._packed_tail_spectrum(sre, sim, obr, obi, dp_ref, dpr_ref,
                                 dpr0_ref, wkr_ref, wki_ref, m=m, tk=tk,
                                 lstop=lstop, selfs=tuple(selfs),
                                 crosses=tuple(crosses), algorithm="f32")
        w1 = pltpu.make_async_copy(
            obr, ore_hbm.at[cc, :, pl.ds(fbk * tk, tk)], osem.at[0])
        w2 = pltpu.make_async_copy(
            obi, oim_hbm.at[cc, :, pl.ds(fbk * tk, tk)], osem.at[1])
        w1.start()
        w2.start()
        last = jnp.logical_and(cc == c - 1, fbk == steps - 1)

        @pl.when(last)
        def _():
            w1.wait()
            w2.wait()

    const = lambda shape: pl.BlockSpec(shape, lambda cc, f: (0, 0),
                                       memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        kernel,
        grid=(c, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            const((m, 1)), const((m, 1)), const(twr.shape),
            const(twi.shape), const(dp.shape), const(dpr.shape),
            const(dpr0.shape), const((m, 1)), const((m, 1)),
        ],
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
    )(xt, jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(dp), jnp.asarray(dpr),
      jnp.asarray(dpr0), jnp.asarray(wkr), jnp.asarray(wki))
    return re, im, nf


def main():
    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.utils.profiling import chain_benchmark

    rng = np.random.default_rng(0)
    c, n = 16, 479232
    _use = lambda o: jnp.sum(o).astype(jnp.float32) * 1e-30

    for nfft, hop in [(2048, 512), (4096, 1024)]:
        x = jnp.asarray(rng.standard_normal((c, n)), dtype=jnp.float32)
        # correctness vs production
        ref = pf.stft_spectrum_packed(x[:2], nfft, hop, onesided=True)
        for tk in (384, 512):
            try:
                re, im, nf = jax.jit(
                    lambda v, tk=tk, nfft=nfft, hop=hop:
                    manual_out_call(v, nfft, hop, tk))(x[:2])
                re.block_until_ready()
            except Exception as e:
                print(json.dumps({"nfft": nfft, "tk": tk,
                                  "error": str(e)[:200]}), flush=True)
                continue
            m = nfft // 2
            lstop = min(pf._LSTOP, m)
            got = jax.lax.complex(
                pf._packed_natural_onesided(
                    jnp.swapaxes(re, -1, -2)[:, :nf, :], m, lstop),
                pf._packed_natural_onesided(
                    jnp.swapaxes(im, -1, -2)[:, :nf, :], m, lstop))
            err = float(jnp.abs(got - ref).max()
                        / jnp.maximum(1.0, jnp.abs(ref).max()))
            r = chain_benchmark(
                f"manual_{nfft}_{tk}",
                lambda v, acc, tk=tk, nfft=nfft, hop=hop: _use(
                    sum(jnp.sum(t) for t in
                        manual_out_call(v + acc * 1e-30, nfft, hop,
                                        tk)[:2])),
                x, n_samples=c * n, iters=100)
            print(json.dumps({"nfft": nfft, "tk": tk, "err": err,
                              "ms": round(r.elapsed_ms, 3)}), flush=True)
        r = chain_benchmark(
            f"production_{nfft}",
            lambda v, acc, nfft=nfft, hop=hop: _use(jnp.abs(
                pf.stft_spectrum_packed(v + acc * 1e-30, nfft, hop,
                                        onesided=True))),
            x, n_samples=c * n, iters=100)
        print(json.dumps({"nfft": nfft, "production_ms":
                          round(r.elapsed_ms, 3)}), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
