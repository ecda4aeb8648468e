"""Differentiability shim for Pallas fast paths.

Pallas kernels have no autodiff rule, so any model that dispatches to one
would break `jax.grad` on TPU — but every kernel here has an XLA-equivalent
reference path that IS differentiable and matches it to f32 rounding.
`kernel_with_xla_vjp` pairs them: the forward pass runs the kernel, the
backward pass differentiates the reference path at the same primal inputs.
The ~1e-7 forward/backward mismatch is far below f32 gradient noise, and
the backward cost equals what the op would have cost without the kernel —
paid only when differentiating (the README's "differentiable end-to-end"
contract; exercised on TPU by scripts and on the north-star chain test).
"""

from __future__ import annotations

import jax


def kernel_with_xla_vjp(fast_fn, ref_fn):
    """custom_vjp callable over ARRAY-only positional args: forward runs
    fast_fn (a Pallas kernel path), backward runs the VJP of ref_fn (the
    XLA path computing the same function). Static parameters must be
    closed over by both callables."""

    @jax.custom_vjp
    def f(*arrays):
        return fast_fn(*arrays)

    def fwd(*arrays):
        return fast_fn(*arrays), arrays

    def bwd(arrays, g):
        _, vjp = jax.vjp(ref_fn, *arrays)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
