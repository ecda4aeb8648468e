"""FFT wrappers + spectral utilities.

Reference: src/spectral/fft.c (plan API + backend vtable), src/spectral/
fft_kiss.c (radix-2 + naive DFT), src/spectral/utils.c (fftshift/wrap/unwrap).

TPU-native design: the FFT "plan" is XLA's FFT HLO — ``jnp.fft`` under jit is
traced once per shape and cached by the compiler, which is exactly the
create-once/execute-many contract of vv_dsp_fft_make_plan/execute
(src/spectral/fft.c:63-107). Scaling convention preserved: forward unscaled,
inverse scaled by 1/n (src/spectral/fft.h:173-176, fft_kiss.c:69-80) — the
numpy/jnp default. The pluggable backend vtable (src/spectral/fft_backend.h)
maps to XLA's own platform dispatch; there is nothing to port.

All transforms act on the last axis and batch over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586476925286766559


def fft(x, n: int | None = None, axis: int = -1):
    """Complex-to-complex forward FFT, unscaled."""
    return jnp.fft.fft(x, n=n, axis=axis)


def ifft(x, n: int | None = None, axis: int = -1):
    """Complex-to-complex inverse FFT, scaled by 1/n."""
    return jnp.fft.ifft(x, n=n, axis=axis)


def rfft(x, n: int | None = None, axis: int = -1):
    """Real-to-complex FFT: n real -> n//2+1 Hermitian-packed bins
    (reference R2C, src/spectral/fft_kiss.c:120-147)."""
    return jnp.fft.rfft(x, n=n, axis=axis)


def irfft(x, n: int, axis: int = -1):
    """Complex-to-real inverse (Hermitian expand + inverse, 1/n scaled);
    n must be given like the reference's plan size (C2R,
    src/spectral/fft_kiss.c:149-174)."""
    return jnp.fft.irfft(x, n=n, axis=axis)


def hermitian_expand(xh, n: int, axis: int = -1):
    """Expand n//2+1 Hermitian-packed bins to the full n-bin spectrum
    (the reference does this inline, e.g. src/spectral/hilbert.c:31-41)."""
    xh = jnp.moveaxis(xh, axis, -1)
    tail = jnp.conj(xh[..., 1 : n - xh.shape[-1] + 1][..., ::-1])
    full = jnp.concatenate([xh, tail], axis=-1)
    return jnp.moveaxis(full, -1, axis)


def fftshift(x, axis=-1):
    """Swap halves: out = [x[n/2:], x[:n/2]] (src/spectral/utils.c:5-46)."""
    return jnp.fft.fftshift(x, axes=axis)


def ifftshift(x, axis=-1):
    return jnp.fft.ifftshift(x, axes=axis)


def phase_wrap(x):
    """Wrap phase to (-pi, pi] (vv_dsp_phase_wrap, src/spectral/utils.c:48-58;
    note -pi maps to +pi, matching the reference's while-loop)."""
    pi = jnp.asarray(jnp.pi, dtype=x.dtype)
    return pi - jnp.mod(pi - x, _TWO_PI)


def phase_unwrap(x, axis: int = -1):
    """1-D phase unwrap (vv_dsp_phase_unwrap, src/spectral/utils.c:60-71)."""
    x = jnp.moveaxis(x, axis, -1)
    d = jnp.diff(x, axis=-1)
    d_wrapped = phase_wrap(d)
    out = jnp.concatenate(
        [x[..., :1], x[..., :1] + jnp.cumsum(d_wrapped, axis=-1)], axis=-1
    )
    return jnp.moveaxis(out, -1, axis)


def next_pow2(v: int) -> int:
    n = 1
    while n < v:
        n <<= 1
    return n
