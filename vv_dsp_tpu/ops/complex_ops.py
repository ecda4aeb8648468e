"""Complex helpers: reference-parity math (src/core/core.c:10-44 — vv_dsp_cpx
make/add/sub/mul/conj/abs/phase/from_polar) plus the TPU-specific transport
layer for complex data.

jnp complex64 arrays replace the reference's {re, im} struct. Beyond the
hypot/atan2 edge-case semantics the reference guarantees, this module owns a
real constraint of the target hardware: some PJRT transports (the tunneled
TPU used here) CANNOT move complex arrays across the host<->device boundary
(UNIMPLEMENTED in both directions). Every complex input/output therefore
crosses the wire as a stacked pair of real arrays and is recombined on the
other side — `cpx_to_device` / `cpx_from_device` are the supported way to
feed complex signals to jitted transforms and to pull complex spectra back.
Inside jit, complex values are ordinary (constants embed fine); only the
boundary needs the split representation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def cpx(re, im):
    """vv_dsp_cpx_make. Uses lax.complex so it lowers on backends whose
    transport layer rejects complex literals (see module docstring)."""
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    if not jnp.issubdtype(re.dtype, jnp.floating):
        re = re.astype(jnp.float32)
        im = im.astype(jnp.float32)
    return jax.lax.complex(re, im.astype(re.dtype))


def cpx_add(a, b):
    return a + b


def cpx_sub(a, b):
    return a - b


def cpx_mul(a, b):
    """vv_dsp_cpx_mul (src/core/core.c:19-23)."""
    return a * b


def cpx_conj(a):
    return jnp.conj(a)


def cpx_abs(a):
    """|a| via hypot (overflow-safe like the reference's hypotf,
    src/core/core.c:28-30)."""
    return jnp.hypot(jnp.real(a), jnp.imag(a))


def cpx_phase(a):
    """atan2(im, re) (src/core/core.c:32-34)."""
    return jnp.arctan2(jnp.imag(a), jnp.real(a))


def cpx_from_polar(mag, phase):
    """vv_dsp_cpx_from_polar (src/core/core.c:36-40)."""
    mag = jnp.asarray(mag)
    return cpx(mag * jnp.cos(phase), mag * jnp.sin(phase))


# ---------------------------------------------------------------------------
# host <-> device transport (no reference counterpart: single-process C has
# no device boundary; the tunneled-PJRT complex restriction makes this the
# framework's complex I/O convention)
# ---------------------------------------------------------------------------

def cpx_to_device(x, device=None):
    """Move a host complex array to the device as complex.

    Splits into a stacked (2, ...) real array for the transfer and recombines
    under jit on-device. Accepts numpy or jnp input; real input passes
    through jax.device_put unchanged.
    """
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.complexfloating):
        return jax.device_put(x, device)
    part = np.float32 if x.dtype == np.complex64 else np.float64
    stacked = np.stack([x.real.astype(part), x.imag.astype(part)])
    stacked = jax.device_put(stacked, device)
    return jax.jit(lambda s: jax.lax.complex(s[0], s[1]))(stacked)


def cpx_from_device(x) -> np.ndarray:
    """Pull a device complex array to host numpy.

    Splits on-device under jit (real/imag), transfers the real pair, and
    reassembles in numpy. Real arrays transfer directly.
    """
    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating):
        return np.asarray(x)
    stacked = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(x)
    host = np.asarray(stacked)
    return host[0] + 1j * host[1]
