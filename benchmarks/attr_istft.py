"""Stage attribution for the packed-real inverse STFT path.

The round-4 profile has stft_1024_roundtrip at 2,286 Msps vs 7,066 forward:
the inverse never got the forward path's kernel treatment.  This bench
decomposes the inverse into its cost layers so the round-5 work targets the
real bottleneck instead of folklore ("the OLA strip grows with tk"):

  fwd        — forward process(rfft=True) alone (for the roundtrip split)
  inv_public — full istft_packed from a precomputed spectrum
  prologue   — the XLA pre-kernel work only: real/imag split +
               _packed_storage_from_natural (stride-nb minor slices!) +
               pad + (c, nf_p, m_pad) -> (c, m_pad, nf_p) transpose
  k0..k5     — cumulative kernel variants on pre-transposed storage input:
               DMA / +Hermitian repack / +idft tail dots / +inverse
               butterflies / +interleave+window / +OLA rolls (full kernel)
  epilogue   — is inv_public minus (prologue + k5): strips transpose +
               main+spill add + norm divide

Diagnostic tool for kernel work — not part of the committed artifact set.
Run: python benchmarks/attr_istft.py [--tk 256]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfft", type=int, default=1024)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--n", type=int, default=479232)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--tk", type=int, default=128)
    args = ap.parse_args()

    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.stft import STFT
    from vv_dsp_tpu.ops.pallas_kernels import _round_up
    from vv_dsp_tpu.ops.window import get_window_np
    from vv_dsp_tpu.utils.profiling import chain_benchmark

    nfft, hop, c, n, tk = args.nfft, args.hop, args.channels, args.n, args.tk
    m = nfft // 2
    q = nfft // hop
    lstop = min(pf._LSTOP, m)
    n_stages = (m // lstop).bit_length() - 1
    m_pad = m + 8
    nf = 1 if n < nfft else 1 + (n - nfft + hop) // hop
    nf_p = _round_up(nf, tk) + tk
    steps = nf_p // tk
    print(f"# geometry: m={m} q={q} tk={tk} nf={nf} nf_p={nf_p} "
          f"steps={steps}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, n)), dtype=jnp.float32)
    plan = STFT(nfft, hop)
    total = c * n

    # --- forward share + full roundtrip + public inverse -----------------
    def _use(out):
        return jnp.sum(out).astype(jnp.float32) * 1e-30

    def _use_c(out):
        return (jnp.sum(jnp.real(out)) + jnp.sum(jnp.imag(out))
                ).astype(jnp.float32) * 1e-30

    results = {}

    def rec(name, r):
        results[name] = r.elapsed_ms
        print(json.dumps({"variant": name, "ms": round(r.elapsed_ms, 3)}),
              flush=True)

    rec("fwd", chain_benchmark(
        "fwd", lambda v, acc: _use_c(plan.process(v + acc * 1e-30, rfft=True)),
        x, n_samples=total, iters=args.iters))

    spec = jax.jit(lambda v: plan.process(v, rfft=True))(x)
    spec.block_until_ready()

    rec("inv_public", chain_benchmark(
        "inv_public", lambda s, acc: _use(pf.istft_packed(
            s + acc * 1e-30, nfft, hop, n, rfft=True)),
        spec, n_samples=total, iters=args.iters))

    rec("roundtrip", chain_benchmark(
        "roundtrip", lambda v, acc: _use(plan.reconstruct(
            plan.process(v + acc * 1e-30, rfft=True), n, rfft=True)),
        x, n_samples=total, iters=args.iters))

    # --- XLA prologue only ----------------------------------------------
    def prologue(s):
        re_n = pf._packed_storage_from_natural(
            jnp.real(s), m, lstop, m_pad).astype(jnp.float32)
        im_n = pf._packed_storage_from_natural(
            jnp.imag(s), m, lstop, m_pad).astype(jnp.float32)
        re_t = jnp.swapaxes(jnp.pad(re_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                            -1, -2)
        im_t = jnp.swapaxes(jnp.pad(im_n, ((0, 0), (0, nf_p - nf), (0, 0))),
                            -1, -2)
        return re_t, im_t

    rec("prologue", chain_benchmark(
        "prologue", lambda s, acc: _use(sum(jnp.sum(t) for t in
                                            prologue(s + acc * 1e-30))),
        spec, n_samples=total, iters=args.iters))

    re_t, im_t = jax.jit(prologue)(spec)
    re_t.block_until_ready()

    # --- cumulative kernel variants on storage input ---------------------
    w_np = get_window_np("hann", nfft, None).astype(np.float32)
    twr, twi = pf._stage_twiddles(m, n_stages)
    dpi = pf._packed_idft(lstop, m)
    dpir = pf._packed_idft_rev(lstop, m)
    p0, pr = pf._packed_self_perms(lstop)
    wkr, wki = pf._packed_wk(nfft, lstop)
    selfs, crosses, _ = pf._packed_pair_plan(m, lstop)
    alg = "f32"

    def make_kernel(stop):
        def kern(re_hbm, im_hbm, w_ref, twr_ref, twi_ref, dpi_ref, dpir_ref,
                 p0_ref, pr_ref, wkr_ref, wki_ref, out_ref, xre, xim, zre,
                 zim, sems):
            cc = pl.program_id(0)
            st = pl.program_id(1)
            d1 = pltpu.make_async_copy(
                re_hbm.at[cc, :, pl.ds(st * tk, tk)], xre, sems.at[0])
            d2 = pltpu.make_async_copy(
                im_hbm.at[cc, :, pl.ds(st * tk, tk)], xim, sems.at[1])
            d1.start(); d2.start(); d1.wait(); d2.wait()

            if stop >= 1:
                # repack (selfs/crosses) into zre/zim — the front half of
                # _packed_repack_inverse
                def repack(lo1, xkr, xki, xmr, xmi):
                    yer = 0.5 * (xkr + xmr)
                    yei = 0.5 * (xki - xmi)
                    d_r = 0.5 * (xkr - xmr)
                    d_i = 0.5 * (xki + xmi)
                    wr = wkr_ref[lo1:lo1 + lstop]
                    wi = wki_ref[lo1:lo1 + lstop]
                    yor = wr * d_r + wi * d_i
                    yoi = wr * d_i - wi * d_r
                    yer2 = 0.5 * (xmr + xkr)
                    yei2 = 0.5 * (xmi - xki)
                    d2r = 0.5 * (xmr - xkr)
                    d2i = 0.5 * (xmi + xki)
                    yor2 = -(wr * d2r - wi * d2i)
                    yoi2 = -(wr * d2i + wi * d2r)
                    return ((yer - yoi, yei + yor),
                            (yer2 - yoi2, yei2 + yor2))

                from vv_dsp_tpu.ops.pallas_kernels import dot_alg
                for b, kind in selfs:
                    lo = b * lstop
                    xkr = xre[lo:lo + lstop, :]
                    xki = xim[lo:lo + lstop, :]
                    packed = jnp.concatenate([xkr, xki], axis=0)
                    pv = dot_alg(p0_ref[:] if kind == 0 else pr_ref[:],
                                 packed, "f32")
                    z1, _ = repack(lo, xkr, xki, pv[:lstop], pv[lstop:])
                    zre[lo:lo + lstop, :] = z1[0]
                    zim[lo:lo + lstop, :] = z1[1]
                    if kind == 0:
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
                    z1, z2 = repack(lo1, xre[lo1:lo1 + lstop, :],
                                    xim[lo1:lo1 + lstop, :],
                                    xre[lo2:lo2 + lstop, :],
                                    xim[lo2:lo2 + lstop, :])
                    zre[lo1:lo1 + lstop, :] = z1[0]
                    zim[lo1:lo1 + lstop, :] = z1[1]
                    zre[lo2:lo2 + lstop, :] = z2[0]
                    zim[lo2:lo2 + lstop, :] = z2[1]
            if stop >= 2:
                from vv_dsp_tpu.ops.pallas_kernels import dot_alg
                dpiv = dpi_ref[:]
                dpirv = dpir_ref[:]
                partner = {b2 for _, b2 in crosses}
                for b_ in range(m // lstop):
                    lo = b_ * lstop
                    packed = jnp.concatenate(
                        [zre[lo:lo + lstop, :], zim[lo:lo + lstop, :]],
                        axis=0)
                    o = dot_alg(dpirv if b_ in partner else dpiv, packed,
                                alg)
                    zre[lo:lo + lstop, :] = o[:lstop]
                    zim[lo:lo + lstop, :] = o[lstop:]
            if stop >= 3:
                pf._inverse_stages(zre, zim, twr_ref, twi_ref, nfft=m,
                                   tk=tk, n_stages=n_stages)
            if stop >= 4:
                y = jnp.stack([zre[:], zim[:]], axis=1).reshape(nfft, tk) \
                    * w_ref[:]
            if stop >= 5:
                acc = jnp.zeros((hop, 2 * tk), jnp.float32)
                for r in range(q):
                    part = jnp.pad(y[r * hop:(r + 1) * hop, :],
                                   ((0, 0), (0, tk)))
                    acc = acc + (part if r == 0 else pltpu.roll(part, r, 1))
                out_ref[0, 0, :, :] = acc
            elif stop >= 4:
                out_ref[0, 0, :, :] = jnp.pad(y[:hop, :], ((0, 0), (0, tk)))
            else:
                out_ref[0, 0, :, :] = jnp.pad(
                    (zre[:hop, :] + zim[:hop, :]) if stop >= 1
                    else (xre[:hop, :] + xim[:hop, :]),
                    ((0, 0), (0, tk)))
        return kern

    const = lambda shape: pl.BlockSpec(shape, lambda c_, s_: (0, 0),
                                       memory_space=pltpu.VMEM)

    def build(stop):
        call = pl.pallas_call(
            make_kernel(stop),
            grid=(c, steps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                const((nfft, 1)), const(twr.shape), const(twi.shape),
                const(dpi.shape), const(dpir.shape), const(p0.shape),
                const(pr.shape), const((m, 1)), const((m, 1)),
            ],
            out_specs=pl.BlockSpec((1, 1, hop, 2 * tk),
                                   lambda c_, s_: (c_, s_, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, steps, hop, 2 * tk),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((m_pad, tk), jnp.float32),
                pltpu.VMEM((m_pad, tk), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.VMEM((m, tk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def run(rt, it):
            return call(rt, it, jnp.asarray(w_np.reshape(nfft, 1)),
                        jnp.asarray(twr), jnp.asarray(twi),
                        jnp.asarray(dpi), jnp.asarray(dpir),
                        jnp.asarray(p0), jnp.asarray(pr), jnp.asarray(wkr),
                        jnp.asarray(wki))
        return run

    names = ["k0 DMA", "k1 +repack", "k2 +idft tail", "k3 +inv butterflies",
             "k4 +interleave+window", "k5 +OLA (full kernel)"]
    both = jnp.stack([re_t, im_t])
    prev = None
    for stop, name in enumerate(names):
        run = build(stop)
        r = chain_benchmark(
            name, lambda b, acc: _use(run(b[0] + acc * 1e-30, b[1])),
            both, n_samples=total, iters=args.iters)
        d = "" if prev is None else f" (delta {r.elapsed_ms - prev:+.3f})"
        print(json.dumps({"variant": name, "ms": round(r.elapsed_ms, 3),
                          "delta_ms": None if prev is None
                          else round(r.elapsed_ms - prev, 3)}), flush=True)
        prev = r.elapsed_ms
        results[name] = r.elapsed_ms

    inv = results["inv_public"]
    k5 = results["k5 +OLA (full kernel)"]
    pro = results["prologue"]
    print(json.dumps({"summary": {
        "inv_public_ms": round(inv, 3),
        "prologue_ms": round(pro, 3),
        "kernel_ms": round(k5, 3),
        "epilogue_ms(residual)": round(inv - pro - k5, 3),
        "fwd_ms": round(results["fwd"], 3),
        "roundtrip_ms": round(results["roundtrip"], 3)}}), flush=True)


if __name__ == "__main__":
    main()
