import numpy as np
import jax.numpy as jnp

from vv_dsp_tpu.ops import framing


def test_num_frames_exact_cases():
    # mirrors tests/framing_tests.c:17-30 semantics
    assert framing.num_frames(100, 32, 16, center=True) == int(np.ceil(100 / 16))
    assert framing.num_frames(100, 32, 16, center=False) == 1 + (100 - 32) // 16
    assert framing.num_frames(10, 32, 16, center=False) == 0
    assert framing.num_frames(0, 32, 0, center=True) == 0


def test_symmetric_index_matches_numpy_pad():
    n = 10
    idx = np.arange(-25, 35)
    x = np.arange(n, dtype=np.float64)
    got = np.asarray(framing.symmetric_index(jnp.asarray(idx), n))
    padded = np.pad(x, (25, 25), mode="symmetric")
    np.testing.assert_array_equal(x[got], padded)


def test_centered_frames_reflect(rng):
    x = rng.standard_normal(50).astype(np.float32)
    frames = np.asarray(framing.fetch_frames(jnp.asarray(x), 16, 8, center=True))
    # frame f centered at f*8, start = f*8 - 8
    padded = np.pad(x, (16, 32), mode="symmetric")
    for f in range(frames.shape[0]):
        start = f * 8 - 8 + 16
        np.testing.assert_allclose(frames[f], padded[start : start + 16])


def test_noncentered_zero_pad(rng):
    x = rng.standard_normal(40).astype(np.float32)
    frames = np.asarray(framing.fetch_frames(jnp.asarray(x), 16, 8, center=False))
    assert frames.shape == (4, 16)
    for f in range(4):
        np.testing.assert_allclose(frames[f], x[f * 8 : f * 8 + 16])


def test_window_multiply(rng):
    x = rng.standard_normal(64).astype(np.float32)
    w = np.hanning(16).astype(np.float32)
    frames = np.asarray(
        framing.fetch_frames(jnp.asarray(x), 16, 16, center=False, window=jnp.asarray(w))
    )
    np.testing.assert_allclose(frames[0], x[:16] * w, rtol=1e-6)


def test_overlap_add_roundtrip(rng):
    # COLA: hann with 50% overlap sums to a constant away from the edges
    x = rng.standard_normal(128).astype(np.float32)
    frames = framing.fetch_frames(jnp.asarray(x), 32, 16, center=False)
    y = np.asarray(framing.overlap_add(frames, 16, 128))
    # interior samples are covered by exactly 2 frames
    np.testing.assert_allclose(y[32:96], 2 * x[32:96], rtol=1e-5)


def test_overlap_add_clips_tail(rng):
    frames = jnp.ones((3, 8), dtype=jnp.float32)
    y = framing.overlap_add(frames, 4, 12)  # last frame spills past 12
    assert y.shape == (12,)
