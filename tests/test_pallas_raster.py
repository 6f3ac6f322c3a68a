"""Pallas event-raster kernel vs the XLA segment-sum reference.

The kernel runs in interpreter mode here (tests force the CPU backend); on
TPU the same pallas_call compiles to an MXU matmul-scatter.
"""
import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops.pallas.raster import rasterize_bilinear
from slam_eds_tpu.utils import events


def _reference(xs, ys, vals, h, w):
    return np.asarray(events.scatter_accumulate(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals), h, w,
        use_pallas=False))


def test_matches_xla_scatter(rng):
    h, w = 48, 64
    n = 700  # not a multiple of the chunk size -> exercises padding
    xs = rng.uniform(-2, w + 2, n).astype(np.float32)
    ys = rng.uniform(-2, h + 2, n).astype(np.float32)
    vals = rng.choice([-1.0, 1.0], n).astype(np.float32)
    got = np.asarray(rasterize_bilinear(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals), h, w,
        chunk=256, interpret=True))
    want = _reference(xs, ys, vals, h, w)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_border_taps_dropped(rng):
    # events whose second tap falls outside contribute only the inside tap
    h, w = 16, 128
    xs = np.asarray([w - 1 + 0.75, -0.25], np.float32)   # x1 = w (out), x0 = -1 (out)
    ys = np.asarray([3.5, 3.5], np.float32)
    vals = np.ones(2, np.float32)
    got = np.asarray(rasterize_bilinear(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals), h, w,
        chunk=128, interpret=True))
    want = _reference(xs, ys, vals, h, w)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.sum() > 0


def test_masked_events_zero(rng):
    h, w = 32, 32
    xs = rng.uniform(0, w - 1, 64).astype(np.float32)
    ys = rng.uniform(0, h - 1, 64).astype(np.float32)
    vals = np.zeros(64, np.float32)
    got = np.asarray(rasterize_bilinear(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals), h, w,
        chunk=64, interpret=True))
    assert np.all(got == 0)
