"""Test harness: run everything on CPU with 8 virtual devices so the sharded
paths (vv_dsp_tpu.parallel) are exercised without a pod — the same mechanism
the driver uses for the multi-chip dry run.

NB: this image's sitecustomize imports jax and registers the TPU backend
before conftest runs, so env vars are too late — use jax.config instead
(backends initialize lazily, so this still wins)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
