"""FFT wrappers + spectral utilities + pluggable backend.

Reference: src/spectral/fft.c (plan API + backend vtable), src/spectral/
fft_kiss.c (radix-2 + naive DFT), src/spectral/utils.c (fftshift/wrap/unwrap).

TPU-native design: the FFT "plan" is a compiled computation — ``jnp.fft``
under jit is traced once per shape and cached, which is the create-once/
execute-many contract of vv_dsp_fft_make_plan/execute (src/spectral/
fft.c:63-107). Scaling convention preserved: forward unscaled, inverse
scaled by 1/n (src/spectral/fft.h:173-176, fft_kiss.c:69-80).

The reference's pluggable backend vtable (src/spectral/fft_backend.h:32-38,
runtime-switchable kiss/FFTW/FFTS) maps to a runtime-switchable kernel
choice here:

- ``"xla"``    — XLA's FFT HLO. Any size, but SLOW on TPU (~86 GFLOPS
                 effective on v5e; the FFT HLO does not use the MXU).
- ``"matmul"`` — dense DFT as an MXU matmul. O(N^2) FLOPs, but the MXU's
                 ~50-60 f32 TFLOPS make it 5-15x FASTER than the FFT HLO for
                 batched transforms up to a few thousand points (benchmarked:
                 STFT-1024 x 30k frames: 18.3 ms xla vs ~1.3 ms matmul).
- ``"auto"``   — (default) matmul on TPU for n <= _MATMUL_MAX_N with a large
                 batch, xla otherwise (CPU: always xla).

All transforms act on the last axis and batch over leading axes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vv_dsp_tpu import config

_TWO_PI = 6.283185307179586476925286766559

_BACKEND = "auto"
_MATMUL_MAX_N = 4096
_BACKENDS = ("auto", "xla", "matmul")


def set_fft_backend(name: str) -> None:
    """Runtime backend switch (vv_dsp_fft_set_backend parity,
    src/spectral/fft.c:15-26)."""
    global _BACKEND
    if name not in _BACKENDS:
        raise ValueError(f"unknown FFT backend {name!r}; one of {_BACKENDS}")
    _BACKEND = name


def get_fft_backend() -> str:
    return _BACKEND


def _use_matmul(n: int, kind: str = "r2c") -> bool:
    if _BACKEND == "matmul":
        return n <= 8192  # hard cap: O(N^2) memory for the basis
    if _BACKEND == "xla":
        return False
    # crossover vs the FFT HLO (measured, v5e): the full c2c basis has 2x the
    # columns of r2c/c2r, so its O(N^2) term catches the HLO one octave lower
    cap = _MATMUL_MAX_N if kind in ("r2c", "c2r") else _MATMUL_MAX_N // 2
    return (jax.default_backend() == "tpu" and n <= cap)


@functools.lru_cache(maxsize=8)
def _dft_basis(n: int, kind: str) -> np.ndarray:
    """Float64 DFT basis matrices, cast at use site.

    kind: 'c2c' -> (n, n) complex exp(-2i pi jk/n); 'r2c' -> (n, n//2+1)
    complex; 'c2r' -> (n//2+1, n) complex such that x = real(X_packed @ M)/1
    with Hermitian weights folded in (1/n scaling included).
    """
    j = np.arange(n, dtype=np.float64)
    if kind == "c2c":
        return np.exp(-2j * np.pi * np.outer(j, j) / n)
    if kind == "c2c_inv":
        return np.conj(np.exp(-2j * np.pi * np.outer(j, j) / n)) / n
    if kind == "r2c":
        k = np.arange(n // 2 + 1, dtype=np.float64)
        return np.exp(-2j * np.pi * np.outer(j, k) / n)
    if kind == "c2r":
        # x[j] = (1/n) * sum_k w_k Re(X[k] e^{+2i pi jk/n}), w = 1 except
        # double for the bins with a mirrored Hermitian partner.
        k = np.arange(n // 2 + 1, dtype=np.float64)
        w = np.full(n // 2 + 1, 2.0)
        w[0] = 1.0
        if n % 2 == 0:
            w[-1] = 1.0
        return (w[:, None] / n) * np.exp(2j * np.pi * np.outer(k, j) / n)
    raise ValueError(kind)


@functools.lru_cache(maxsize=16)
def _basis_cast(n: int, kind: str, part: str, dtype_name: str) -> np.ndarray:
    """HOST-side casted basis, cached — the expensive O(N^2) astype runs
    once per (n, kind, dtype). The device upload happens at the call site:
    caching `jnp.asarray` here would capture a TRACER when first invoked
    inside a jit trace and poison every later trace
    (UnexpectedTracerError). Cast in numpy BEFORE the transfer — TPUs have
    no f64 and an eager f64 host->device convert is unimplemented.)"""
    b = _dft_basis(n, kind)
    b = b.real if part == "re" else b.imag
    return np.ascontiguousarray(b).astype(np.dtype(dtype_name))


def _mm_basis(a, n: int, kind: str, part: str, out_dtype):
    b = jnp.asarray(_basis_cast(n, kind, part, jnp.dtype(out_dtype).name))
    return jnp.einsum("...n,nk->...k", a.astype(out_dtype), b,
                      precision=config.MATMUL_PRECISION)


def _real_compute_dtype(x):
    """Floating dtype for matmul transforms of possibly-integer input."""
    d = jnp.real(x).dtype
    return d if jnp.issubdtype(d, jnp.floating) else jnp.float32


def _matmul_fft(x, n: int, inverse: bool):
    # all-real decomposition: X = (xr + i xi)(Br + i Bi)
    #   Re = xr Br - xi Bi,  Im = xr Bi + xi Br
    # (keeps the MXU in real f32 AND avoids host->device complex constants,
    # which some PJRT transports cannot transfer)
    kind = "c2c_inv" if inverse else "c2c"
    xr, xi = jnp.real(x), jnp.imag(x)
    dt = _real_compute_dtype(x)
    re = _mm_basis(xr, n, kind, "re", dt) - _mm_basis(xi, n, kind, "im", dt)
    im = _mm_basis(xr, n, kind, "im", dt) + _mm_basis(xi, n, kind, "re", dt)
    return jax.lax.complex(re, im)


def _matmul_rfft_parts(x, n: int):
    # two real matmuls (cos / -sin); keeps the MXU in real f32
    dt = _real_compute_dtype(x)
    return (_mm_basis(x, n, "r2c", "re", dt),
            _mm_basis(x, n, "r2c", "im", dt))


def _matmul_rfft(x, n: int):
    re, im = _matmul_rfft_parts(x, n)
    return jax.lax.complex(re, im)


def _matmul_irfft(xh, n: int):
    dt = _real_compute_dtype(xh)
    re = _mm_basis(jnp.real(xh), n, "c2r", "re", dt)
    im = _mm_basis(jnp.imag(xh), n, "c2r", "im", dt)
    return re - im


def _pad_or_trim(x, n: int | None, axis: int):
    if n is None:
        return x, x.shape[axis]
    cur = x.shape[axis]
    if cur == n:
        return x, n
    if cur > n:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, n)
        return x[tuple(idx)], n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, n - cur)
    return jnp.pad(x, pads), n


def fft(x, n: int | None = None, axis: int = -1):
    """Complex-to-complex forward FFT, unscaled."""
    x, n = _pad_or_trim(x, n, axis)
    if _use_matmul(n, "c2c"):
        x = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(_matmul_fft(x, n, inverse=False), -1, axis)
    return jnp.fft.fft(x, axis=axis)


def ifft(x, n: int | None = None, axis: int = -1):
    """Complex-to-complex inverse FFT, scaled by 1/n."""
    x, n = _pad_or_trim(x, n, axis)
    if _use_matmul(n, "c2c"):
        x = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(_matmul_fft(x, n, inverse=True), -1, axis)
    return jnp.fft.ifft(x, axis=axis)


def rfft(x, n: int | None = None, axis: int = -1):
    """Real-to-complex FFT: n real -> n//2+1 Hermitian-packed bins
    (reference R2C, src/spectral/fft_kiss.c:120-147)."""
    x, n = _pad_or_trim(x, n, axis)
    if _use_matmul(n):
        x = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(_matmul_rfft(x, n), -1, axis)
    return jnp.fft.rfft(x, axis=axis)


def rfft_power(x, n: int | None = None, axis: int = -1):
    """|rfft(x)|^2 without materializing the complex spectrum.

    On the matmul backend the power is re^2 + im^2 of the two real matmul
    outputs — XLA fuses it, saving the complex64 HBM round trip (the
    dominant cost of spectrogram->mel pipelines at large batch).
    """
    x, n = _pad_or_trim(x, n, axis)
    if _use_matmul(n):
        x = jnp.moveaxis(x, axis, -1)
        re, im = _matmul_rfft_parts(x, n)
        return jnp.moveaxis(re * re + im * im, -1, axis)
    s = jnp.fft.rfft(x, axis=axis)
    return jnp.square(jnp.abs(s))


def irfft(x, n: int, axis: int = -1):
    """Complex-to-real inverse (Hermitian expand + inverse, 1/n scaled);
    n must be given like the reference's plan size (C2R,
    src/spectral/fft_kiss.c:149-174)."""
    if _use_matmul(n):
        x = jnp.moveaxis(x, axis, -1)
        x, _ = _pad_or_trim(x, n // 2 + 1, -1)
        return jnp.moveaxis(_matmul_irfft(x, n), -1, axis)
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
