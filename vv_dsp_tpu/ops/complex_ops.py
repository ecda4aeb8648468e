"""Complex helper functions (reference: src/core/core.c:10-44 — vv_dsp_cpx
make/add/sub/mul/conj/abs/phase/from_polar).

jnp complex64 arrays replace the reference's {re, im} struct; these wrappers
exist for API-surface parity and for the hypot/atan2 edge-case semantics the
reference guarantees (abs via hypot avoids overflow; phase via atan2 handles
signed zeros). All batch over any shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def cpx(re, im):
    """vv_dsp_cpx_make."""
    return jnp.asarray(re) + 1j * jnp.asarray(im)


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
    return mag * jnp.cos(phase) + 1j * (mag * jnp.sin(phase))
