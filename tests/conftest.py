"""Test harness: run everything on CPU with 8 virtual devices so the sharded
paths (vv_dsp_tpu.parallel) are exercised without a pod — the same mechanism
the driver uses for the multi-chip dry run.

Set VV_TPU_TESTS=1 to keep the real TPU backend instead: the interpret-mode
kernel tests still pass (they pin interpret=True explicitly), and the
hardware-gated module tests/test_tpu_hardware.py stops skipping — it
compiles the Pallas kernels through Mosaic on the actual chip and checks
them against the same oracles. Run that module STANDALONE under the flag:
the sharded suites (tests/test_parallel.py etc.) need 8 devices and are
not runnable on a 1-4 chip host with the CPU mesh config skipped.

NB: this image's sitecustomize imports jax and registers the TPU backend
before conftest runs, so env vars are too late — use jax.config instead
(backends initialize lazily, so this still wins)."""

import os

import jax

if os.environ.get("VV_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
