"""Accuracy/throughput knob — the counterpart of the reference's
examples/fastapprox_example.c (its VV_DSP_FAST_EXP / has_fastapprox
demo): on TPU the fast-approx-math role is played by the MXU matmul
precision tiers, switched at runtime with config.set_matmul_precision.

Shows the error each tier introduces on an MFCC front-end vs the
f32-parity tier (full measured curve: benchmarks/accuracy_tradeoff.json,
docs/PERFORMANCE.md)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

# Small interactive examples run best on host CPU. NB: this image initializes
# the TPU plugin before user code, so the JAX_PLATFORMS env var is ignored —
# jax.config is the reliable switch (delete these two lines to run on TPU).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu import config
from vv_dsp_tpu.models import MFCCFrontend
from vv_dsp_tpu.ops import fft

print("vv-dsp-tpu precision-knob example")
print("=================================\n")
print("Available accuracy tiers (config.set_matmul_precision):")
print("- highest: 6-pass bf16x3, f32-parity (the default contract)")
print("- high:    3-pass bf16x3 (~1e-5 rel err)")
print("- default: single-pass bf16 (~1e-3 rel err, fastest)\n")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 48000)), dtype=jnp.float32)
frontend = MFCCFrontend()

# force the matmul transform tier so the knob has something to act on
fft.set_fft_backend("matmul")
config.set_matmul_precision("highest")
ref = np.asarray(jax.jit(frontend)(x))

if jax.default_backend() != "tpu":
    print("(running on CPU: all tiers are true f32 there — the knob only "
          "changes the TPU MXU's bf16 pass count, so errors appear on TPU)")
for tier in ("highest", "high", "default"):
    config.set_matmul_precision(tier)
    out = np.asarray(jax.jit(frontend)(x))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"MFCC @ {tier:8s}: max rel err vs highest = {err:.2e}")

config.set_matmul_precision("highest")
fft.set_fft_backend("auto")
print("\nThroughput per tier (measured on v5e): see docs/PERFORMANCE.md")
