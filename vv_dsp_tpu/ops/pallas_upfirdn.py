"""Banded-matmul upfirdn Pallas kernel — the head primitive for FIR,
polyphase resampling, and the fused FIR+resample chain head.

The op is y[k] = sum_j x[j] * g[offset + k*down - j*up] (reference hot loops:
src/filter/fir.c:170-193, src/resample/resampler.c:88-119). Every XLA
formulation measured on v5e loses to structure, not FLOPs: stream-split /
phase-interleave transposes with 3-4 wide minor dims cost ~1.7 ms each
(XLA's narrow-minor emitters), per-term shifted slices relayout on misaligned
sublanes, and lax.conv is ~500x off. This kernel removes ALL of that:

- the signal is time-blocked: segment m holds outputs [m*b_out, (m+1)*b_out)
  and reads inputs [j_lo0 + m*b_in, ...+k_w) where b_in = b_out*down/up
  (b_out a multiple of `up` makes every segment share ONE weight matrix);
- segments ride the LANE axis (128 per grid step), input rows the sublanes;
  the cross-segment halo (k_w - b_in rows) comes from neighbor lanes via
  pltpu.roll over a 256-lane DMA window — no unaligned DMA, no transposes;
- the whole segment is ONE MXU dot W (b_out, k_w) @ X_ext (k_w, 128); W is
  the banded upfirdn matrix, dense-with-zeros — the MXU eats the band waste
  at full-tile speed where every "clever" sparse structure dies on layout;
- output rows are already natural time order: the only post-op is one
  large-minor-dim XLA transpose (cheap).

Measured (v5e, 16ch x 479k f32, chained timing incl. ~1.3 ms/iter harness
floor): fused 1024-tap FIR + 4/3 resample 3.8 ms vs 7.1 ms for the tall
banded einsum; 4/3 resample alone 3.4 ms vs 6.9 ms for the per-phase strided
Pallas kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_W_VMEM_CAP = 6 * 1024 * 1024   # resident weight matrix budget (bytes)
_EXT_ROWS_CAP = 4096            # ext scratch rows (k_w) cap
_B_IN_CAP = 2048                # DMA window rows cap


from vv_dsp_tpu.ops.pallas_kernels import (_kernel_precision, _on_tpu,
                                            _round_up)


def _geometry(up: int, down: int, len_g: int, offset: int, b_out: int):
    """(b_in, j_lo0, k_wp) for a segment of b_out outputs."""
    b_in = b_out * down // up
    j_lo0 = -(-(offset - len_g + 1) // up)
    j_hi = (offset + (b_out - 1) * down) // up
    k_wp = _round_up(j_hi - j_lo0 + 1, 8)
    return b_in, j_lo0, k_wp


def pick_b_out(up: int, down: int, len_g: int, offset: int) -> int | None:
    """Largest segment length whose weight matrix and scratch fit VMEM;
    None when no candidate fits (huge filters / extreme ratios)."""
    for base in (2048, 1024, 512, 256, 128):
        b_out = _round_up(base, up)
        b_in, _, k_wp = _geometry(up, down, len_g, offset, b_out)
        if (b_out * k_wp * 4 <= _W_VMEM_CAP and k_wp <= _EXT_ROWS_CAP
                and b_in <= _B_IN_CAP and b_out <= 4096
                # halo rolls read lane f + a, f < 128, inside a 256-lane
                # window: the neighbor span must stay within it
                and -(-k_wp // b_in) - 1 <= 128):
            return b_out
    return None


def banded_supported(up: int, down: int, len_g: int, offset: int) -> bool:
    return (up >= 1 and down >= 1 and up <= 512
            and pick_b_out(up, down, len_g, offset) is not None)


@functools.lru_cache(maxsize=32)
def _band_matrix(g_key, up: int, down: int, offset: int, b_out: int,
                 j_lo0: int, k_wp: int) -> np.ndarray:
    g = np.asarray(g_key, dtype=np.float64)
    t = np.arange(b_out)[:, None]
    i = np.arange(k_wp)[None, :]
    gi = offset + t * down - (j_lo0 + i) * up
    valid = (gi >= 0) & (gi < len(g))
    return np.where(valid, g[np.clip(gi, 0, len(g) - 1)],
                    0.0).astype(np.float32)


def _resolve_algorithm(algorithm: str | None) -> str:
    """See pallas_kernels.dot_algorithm (shared knob -> algorithm map)."""
    from vv_dsp_tpu.ops.pallas_kernels import dot_algorithm
    return dot_algorithm(algorithm)


def _row_groups(up: int, down: int, len_g: int, offset: int, b_out: int,
                j_lo0: int, k_wp: int):
    """Split the banded weight matrix into row groups, each dotting only
    its own input span [klo, khi): the band slides by down/up rows per
    output, so the full (b_out, k_wp) dot wastes the ~b_out*down/up
    columns outside each row's band.  4 groups of >=128 rows cut the
    flagship head's MXU FLOPs 20% (measured -11% kernel time)."""
    groups = 1
    for g_ in (4, 2):
        if b_out % g_ == 0 and b_out // g_ >= 128:
            groups = g_
            break
    rows_per = b_out // groups
    spans = []
    for gi in range(groups):
        r0, r1 = gi * rows_per, (gi + 1) * rows_per
        klo = max(0, -(-(offset - len_g + 1 + r0 * down) // up) - j_lo0)
        klo = (klo // 8) * 8
        khi = min(k_wp, (offset + (r1 - 1) * down) // up - j_lo0 + 1)
        khi = min(k_wp, _round_up(khi, 8))
        spans.append((rows_per, klo, khi))
    return tuple(spans)


def _pack_weights(w_np: np.ndarray, spans, algorithm: str) -> np.ndarray:
    """Stack per-group weight slices (bf16 hi/lo split per group for
    bf16x3), each padded to the widest group span."""
    kmax = max(khi - klo for _, klo, khi in spans)
    parts = []
    r0 = 0
    for rows, klo, khi in spans:
        sub = w_np[r0:r0 + rows, klo:khi]
        r0 += rows
        if algorithm == "bf16x3":
            hi = sub.astype(jnp.bfloat16)
            lo = (sub - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            parts += [np.asarray(hi), np.asarray(lo)]
        elif algorithm == "bf16":
            parts.append(np.asarray(sub.astype(jnp.bfloat16)))
        else:
            parts.append(sub)
    parts = [np.pad(p, ((0, 0), (0, kmax - p.shape[1]))) for p in parts]
    return np.concatenate(parts, axis=0)


def _kern(x_main, x_next, w_ref, out_ref, ext, *, b_in, k_wp, n_roll,
          spans, algorithm):
    # x_main/x_next: auto-pipelined (b_in, 128) lane-blocks j and j+1 of the
    # same array — Pallas double-buffers BlockSpec inputs across grid steps,
    # which manual in-kernel DMA would serialize (measured ~1 ms of the
    # fused head). ext rows [a*b_in, ...) come from lane-neighbor segment
    # m+a: roll within the 256-lane concat so lane 127 reads lane 128.
    xv = jnp.concatenate([x_main[0], x_next[0]], axis=1)
    for a in range(n_roll):
        lo = a * b_in
        if lo >= k_wp:
            break
        hi = min(k_wp, lo + b_in)
        src = xv if a == 0 else pltpu.roll(xv, 256 - a, 1)
        ext[lo:hi, :] = src[: hi - lo, :128]
    ev = ext[:]
    if algorithm == "bf16x3":
        # per group: [W_hi; W_lo] (bf16 split of the f64 band matrix); the
        # signal splits in-kernel.  3 single-pass bf16 dots — measured
        # 7.7e-6 max rel err vs a float64 oracle at flagship geometry
        # (f32 6-pass: 2.3e-6) for ~1.9x the matmul throughput.
        e_hi = ev.astype(jnp.bfloat16)
        e_lo = (ev - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    outs = []
    wrow = 0
    for rows, klo, khi in spans:
        kw = khi - klo
        if algorithm == "f32":
            outs.append(jnp.dot(w_ref[wrow:wrow + rows, :kw], ev[klo:khi, :],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST))
            wrow += rows
        elif algorithm == "bf16x3":
            wh = w_ref[wrow:wrow + rows, :kw]
            wl = w_ref[wrow + rows:wrow + 2 * rows, :kw]
            eh = e_hi[klo:khi, :]
            el = e_lo[klo:khi, :]
            acc = jnp.dot(wh, eh, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(wh, el, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(wl, eh, preferred_element_type=jnp.float32)
            outs.append(acc)
            wrow += 2 * rows
        else:
            outs.append(jnp.dot(w_ref[wrow:wrow + rows, :kw],
                                ev[klo:khi, :].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
            wrow += rows
    out_ref[0, :, :] = outs[0] if len(outs) == 1 \
        else jnp.concatenate(outs, axis=0)


def upfirdn_banded_pallas(x, g, up: int, down: int, offset: int, n_out: int,
                          b_out: int | None = None,
                          interpret: bool | None = None,
                          algorithm: str | None = None,
                          tiled_output: bool = False):
    """y[k] = sum_j x[j] g[offset + k*down - j*up], k in [0, n_out);
    x: (channels, n) f32, g: host-side taps. Zero-padded edges (the
    _upfirdn_gather semantics); sample-exact vs it (tested).

    algorithm: dot algorithm "f32" | "bf16x3" | "bf16"; None follows the
    config.set_matmul_precision knob (see _resolve_algorithm)."""
    if interpret is None:
        interpret = not _on_tpu()
    algorithm = _resolve_algorithm(algorithm)
    g = np.asarray(g, dtype=np.float64)
    len_g = len(g)
    if b_out is None:
        b_out = pick_b_out(up, down, len_g, offset)
        if b_out is None:
            raise ValueError("no VMEM-feasible segment size; "
                             "check banded_supported() first")
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    c_, n_in = x.shape
    b_in, j_lo0, k_wp = _geometry(up, down, len_g, offset, b_out)

    nblk_p = _round_up(-(-n_out // b_out), 128) + 128  # +128: lane halo
    total = nblk_p * b_in
    lo = j_lo0
    pad_l = max(0, -lo)
    pad_r = max(0, lo + total - n_in)
    xw = jnp.pad(x, ((0, 0), (pad_l, pad_r)))[:, lo + pad_l: lo + pad_l + total]
    xt = jnp.swapaxes(xw.reshape(c_, nblk_p, b_in), -1, -2)  # (C, b_in, nblk)

    w_np = _band_matrix(tuple(g), up, down, offset, b_out, j_lo0, k_wp)
    spans = _row_groups(up, down, len_g, offset, b_out, j_lo0, k_wp)
    w_arr = _pack_weights(w_np, spans, algorithm)
    n_roll = -(-k_wp // b_in) + 1

    kernel = functools.partial(_kern, b_in=b_in, k_wp=k_wp, n_roll=n_roll,
                               spans=spans, algorithm=algorithm)
    out = pl.pallas_call(
        kernel,
        grid=(c_, nblk_p // 128 - 1),
        in_specs=[
            pl.BlockSpec((1, b_in, 128), lambda c, j: (c, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_in, 128), lambda c, j: (c, 0, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_arr.shape, lambda c, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_out, 128), lambda c, j: (c, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_, b_out, nblk_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k_wp, 128), jnp.float32),
        ],
        interpret=interpret,
    )(xt, xt, jnp.asarray(w_arr))
    if tiled_output:
        # raw segment-tiled layout (c, b_out, nblk_p): segment m holds
        # outputs [m*b_out, (m+1)*b_out) — when b_out equals a downstream
        # kernel's hop this IS its input tiling, so the epilogue transpose
        # AND that kernel's prologue transpose both vanish (the chain's
        # tiled handoff).  Segments >= ceil(n_out/b_out) hold the
        # convolution tail past n_out, NOT zeros — consumers must mask.
        return out
    y = jnp.swapaxes(out, -1, -2).reshape(c_, nblk_p * b_out)
    return y[:, :n_out]
