"""MXU dot-strategy experiments for the packed STFT kernel's DFT-lstop
tail (the dominant phase per attr_stft_kernel.py: 0.41 of 0.83 device ms).

Variants (tail dots only; prologue/butterflies/mel identical):
  3dot    — current dot_alg bf16x3: three separate MXU dots + VPU adds
  fused   — ONE dot per block: [Wh | Wh | Wl] @ [Xh; Xl; Xh] (K=3*128),
            accumulation entirely inside the MXU
  f32     — 6-pass f32 dots (accuracy reference)
  bf16    — single-pass bf16 (speed ceiling for this structure)

Diagnostic tool, not a committed artifact.
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
    ap.add_argument("--nfft", type=int, default=2048)
    ap.add_argument("--hop", type=int, default=512)
    ap.add_argument("--n", type=int, default=638976)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from vv_dsp_tpu.ops import pallas_fft as pf
    from vv_dsp_tpu.ops.pallas_kernels import dot_alg, _round_up
    from vv_dsp_tpu.ops.window import get_window_np
    from vv_dsp_tpu.utils.profiling import chain_benchmark

    nfft, hop = args.nfft, args.hop
    c, n = args.channels, args.n
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

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, n)), dtype=jnp.float32)

    w_np = get_window_np("hann", nfft, None).astype(np.float32)
    we = np.ascontiguousarray(w_np[0::2]).reshape(m, 1)
    wo = np.ascontiguousarray(w_np[1::2]).reshape(m, 1)
    twr, twi = pf._stage_twiddles(m, n_stages)
    dp, dpr, dpr0 = pf._packed_tail_mats(lstop)
    wkr, wki = pf._packed_wk(nfft, lstop)
    selfs, crosses, _ = pf._packed_pair_plan(m, lstop)

    def split3(w):
        hi = w.astype(np.float32).astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return np.concatenate([np.asarray(hi), np.asarray(hi),
                               np.asarray(lo)], axis=1)  # (2L, 6L)

    dp3, dpr3, dpr03 = split3(dp), split3(dpr), split3(dpr0)

    # simpler: close over wkr/wki arrays as jnp consts baked into the kernel
    wkr_c = jnp.asarray(wkr)
    wki_c = jnp.asarray(wki)

    def make_kernel2(variant, dps):
        def kern(xt_hbm, we_ref, wo_ref, twr_ref, twi_ref, dp_ref, dpr_ref,
                 dpr0_ref, wkr_ref, wki_ref, out_ref, xv, sre_ref, sim_ref,
                 sem):
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
            pf._forward_stages(sre_ref, sim_ref, twr_ref, twi_ref,
                               nfft=m, tk=tk, n_stages=n_stages,
                               real_input=False)

            def unpack(lo1, nr, ni, rr, ri):
                # the 1/2 lives in the (pre-scaled) tail matrices — keep
                # this in sync with _packed_tail_power's algebra
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

            def prep(lo_):
                packed = jnp.concatenate(
                    [sre_ref[lo_:lo_ + lstop, :],
                     sim_ref[lo_:lo_ + lstop, :]], axis=0)
                if variant == "fused":
                    ph = packed.astype(jnp.bfloat16)
                    plo = (packed - ph.astype(jnp.float32)
                           ).astype(jnp.bfloat16)
                    return jnp.concatenate([ph, plo, ph], axis=0)
                return packed

            def do_dot(wmat, rhs):
                if variant == "fused":
                    return jnp.dot(wmat, rhs,
                                   preferred_element_type=jnp.float32)
                return dot_alg(wmat, rhs,
                               "f32" if variant == "f32"
                               else ("bf16" if variant == "bf16"
                                     else "bf16x3"))

            if variant == "split":
                # phase 1: ALL dots (MXU), overwriting the consumed block
                # rows in place: nv -> [sre lo1; sim lo1], rv -> [sre lo2;
                # sim lo2]; phase 2: ALL unpack algebra (VPU).  Tests
                # whether the interleaved dot->unpack->dot chain stalls the
                # MXU/VPU pipelines.
                for b, kind in selfs:
                    lo = b * lstop
                    rhs = prep(lo)
                    nv = do_dot(dp_ref[:], rhs)
                    rv = do_dot(dpr0_ref[:] if kind == 0 else dpr_ref[:],
                                rhs)
                    p1, p2 = unpack(lo, nv[:lstop], nv[lstop:], rv[:lstop],
                                    rv[lstop:])
                    sre_ref[lo:lo + lstop, :] = p1
                for b1, b2 in crosses:
                    lo1, lo2 = b1 * lstop, b2 * lstop
                    rhs1 = prep(lo1)
                    rhs2 = prep(lo2)
                    nv = do_dot(dp_ref[:], rhs1)
                    rv = do_dot(dpr_ref[:], rhs2)
                    sre_ref[lo1:lo1 + lstop, :] = nv[:lstop]
                    sim_ref[lo1:lo1 + lstop, :] = nv[lstop:]
                    sre_ref[lo2:lo2 + lstop, :] = rv[:lstop]
                    sim_ref[lo2:lo2 + lstop, :] = rv[lstop:]
                for b1, b2 in crosses:
                    lo1, lo2 = b1 * lstop, b2 * lstop
                    p1, p2 = unpack(lo1, sre_ref[lo1:lo1 + lstop, :],
                                    sim_ref[lo1:lo1 + lstop, :],
                                    sre_ref[lo2:lo2 + lstop, :],
                                    sim_ref[lo2:lo2 + lstop, :])
                    sre_ref[lo1:lo1 + lstop, :] = p1
                    sre_ref[lo2:lo2 + lstop, :] = p2
                out_ref[0, :, :] = sre_ref[:8, :]
                return
            for b, kind in selfs:
                lo = b * lstop
                rhs = prep(lo)
                nv = do_dot(dp_ref[:], rhs)
                rv = do_dot(dpr0_ref[:] if kind == 0 else dpr_ref[:], rhs)
                p1, p2 = unpack(lo, nv[:lstop], nv[lstop:], rv[:lstop],
                                rv[lstop:])
                sre_ref[lo:lo + lstop, :] = p1
            for b1, b2 in crosses:
                lo1, lo2 = b1 * lstop, b2 * lstop
                rhs1 = prep(lo1)
                rhs2 = prep(lo2)
                nv = do_dot(dp_ref[:], rhs1)
                rv = do_dot(dpr_ref[:], rhs2)
                p1, p2 = unpack(lo1, nv[:lstop], nv[lstop:], rv[:lstop],
                                rv[lstop:])
                sre_ref[lo1:lo1 + lstop, :] = p1
                sre_ref[lo2:lo2 + lstop, :] = p2
            out_ref[0, :, :] = sre_ref[:8, :]
        return kern

    const = lambda shape: pl.BlockSpec(shape, lambda cc, f: (0, 0),
                                       memory_space=pltpu.VMEM)

    def build(variant):
        if variant == "fused":
            dmats = (dp3, dpr3, dpr03)
        else:
            dmats = (dp, dpr, dpr0)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),
            const((m, 1)), const((m, 1)), const(twr.shape), const(twi.shape),
            const(dmats[0].shape), const(dmats[1].shape),
            const(dmats[2].shape), const((m, 1)), const((m, 1)),
        ]
        consts = [jnp.asarray(we), jnp.asarray(wo), jnp.asarray(twr),
                  jnp.asarray(twi), jnp.asarray(dmats[0]),
                  jnp.asarray(dmats[1]), jnp.asarray(dmats[2]),
                  wkr_c, wki_c]
        call = pl.pallas_call(
            make_kernel2(variant, dmats),
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

    for variant in ("3dot", "split", "fused", "f32", "bf16"):
        run = build(variant)
        r = chain_benchmark(f"tail[{variant}]", lambda v, acc: jnp.sum(
            run(v + acc * 1e-30)).astype(jnp.float32) * 1e-30,
            x, n_samples=c * n, iters=args.iters)
        print(json.dumps({"variant": variant,
                          "ms": round(r.elapsed_ms, 3)}), flush=True)
        # numeric agreement vs f32 on a small slice
        out = run(x)
        if variant == "3dot":
            ref_out = out
        elif variant != "split":   # split stashes rv loosely; timing-only
            d = float(jnp.max(jnp.abs(out - ref_out))
                      / (jnp.max(jnp.abs(ref_out)) + 1e-30))
            print(json.dumps({"variant": variant,
                              "max_rel_vs_3dot": f"{d:.2e}"}), flush=True)


if __name__ == "__main__":
    main()
