"""Serving memory story: every host-side constant cache is a bounded
functools.lru_cache, config.clear_all_caches() empties all of them, and a
server cycling many geometries has bounded host RSS growth (the reference
bounds its one plan cache to a 64-bucket LRU,
src/spectral/fft_fftw.c:52-56)."""

import resource

import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu import config


def _touch_geometry(i: int):
    """Build per-geometry constants across the cached subsystems."""
    from vv_dsp_tpu.ops import dct as vdct
    from vv_dsp_tpu.ops import mel as vmel
    from vv_dsp_tpu.ops import window as vwin
    from vv_dsp_tpu.ops.stft import STFT

    n = 256 + 8 * i
    x = jnp.asarray(np.linspace(-1, 1, 4 * n, dtype=np.float32)[None])
    vwin.get_window_np("kaiser", n, 4.0 + 0.01 * i)
    vdct.dct(jnp.asarray(np.ones((1, n), np.float32)), type=2)
    vmel.mel_filterbank_np(512, 20 + (i % 8), 16000.0 + i, 0.0, 8000.0,
                           "htk")
    STFT(512, 128).power(x)


def test_clear_all_caches_empties_everything():
    _touch_geometry(0)
    n_cleared = config.clear_all_caches()
    assert n_cleared >= 20  # every cached table across the loaded modules
    # spot-check: the caches really are empty now
    import sys
    for name, mod in sys.modules.items():
        if mod is None or not name.startswith("vv_dsp_tpu"):
            continue
        for attr in vars(mod).values():
            if hasattr(attr, "cache_info") and hasattr(attr, "cache_clear"):
                assert attr.cache_info().currsize == 0, (name, attr)


def test_all_package_caches_are_bounded():
    """No unbounded lru_cache(maxsize=None) anywhere in the package."""
    import sys
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith("vv_dsp_tpu"):
            continue
        for attr in vars(mod).values():
            if hasattr(attr, "cache_info") and hasattr(attr, "cache_clear"):
                assert attr.cache_info().maxsize is not None, (name, attr)


def test_geometry_cycling_bounded_rss():
    """50 distinct geometries with periodic clear_all_caches: host RSS must
    not grow unboundedly (tolerance covers allocator slack + jit cache)."""
    for i in range(8):  # warmup: allocator pools, first compilations
        _touch_geometry(i)
    config.clear_all_caches()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for i in range(8, 58):
        _touch_geometry(i)
        if i % 10 == 0:
            config.clear_all_caches()
    config.clear_all_caches()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    grown_mb = (rss1 - rss0) / 1024.0  # ru_maxrss is KB on linux
    assert grown_mb < 1024.0, f"RSS grew {grown_mb:.0f} MB over 50 geometries"
