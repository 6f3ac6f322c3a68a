import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.utils import events


def test_scatter_bilinear_single_event():
    xs = jnp.asarray([3.25], jnp.float32)
    ys = jnp.asarray([5.75], jnp.float32)
    v = jnp.asarray([1.0], jnp.float32)
    img = events.scatter_accumulate(xs, ys, v, 10, 10)
    np.testing.assert_allclose(img[5, 3], 0.75 * 0.25, atol=1e-6)
    np.testing.assert_allclose(img[6, 3], 0.75 * 0.75, atol=1e-6)
    np.testing.assert_allclose(img[5, 4], 0.25 * 0.25, atol=1e-6)
    np.testing.assert_allclose(img[6, 4], 0.25 * 0.75, atol=1e-6)
    np.testing.assert_allclose(img.sum(), 1.0, atol=1e-6)


def test_scatter_nn():
    img = events.scatter_accumulate(jnp.asarray([2.6]), jnp.asarray([7.4]),
                                    jnp.asarray([-1.0]), 10, 10, method="nn")
    assert float(img[7, 3]) == -1.0


def test_scatter_out_of_bounds_taps_dropped():
    img = events.scatter_accumulate(jnp.asarray([-0.5, 9.5], jnp.float32),
                                    jnp.asarray([0.0, 9.5], jnp.float32),
                                    jnp.asarray([1.0, 1.0], jnp.float32), 10, 10)
    # first event: only x=0 taps in-bounds (0.5 weight); second: only (9,9)
    np.testing.assert_allclose(img.sum(), 0.5 + 0.25, atol=1e-6)
    assert np.isfinite(np.asarray(img)).all()


def test_scatter_mask(rng):
    n = 64
    xs = jnp.asarray(rng.uniform(1, 8, n), jnp.float32)
    ys = jnp.asarray(rng.uniform(1, 8, n), jnp.float32)
    v = jnp.ones(n, jnp.float32)
    mask = jnp.arange(n) < 10
    img = events.scatter_accumulate(xs, ys, v, 10, 10, mask=mask)
    np.testing.assert_allclose(img.sum(), 10.0, atol=1e-4)


def test_time_weights_bell():
    w = events.event_time_weights(jnp.asarray(100), 128)
    w = np.asarray(w)
    assert w[50] > w[10] and w[50] > w[90]
    np.testing.assert_allclose(w[50], 1.0, atol=0.01)


def test_build_event_frame_normalized(rng):
    n, cap = 200, 256
    xs = jnp.asarray(np.concatenate([rng.uniform(2, 30, n), np.zeros(cap - n)]), jnp.float32)
    ys = jnp.asarray(np.concatenate([rng.uniform(2, 30, n), np.zeros(cap - n)]), jnp.float32)
    pol = jnp.asarray(np.concatenate([rng.choice([-1, 1], n), np.zeros(cap - n)]), jnp.float32)
    frames, norms = events.build_event_frame(xs, ys, pol, jnp.asarray(n), 32, 32,
                                             num_levels=3)
    assert frames.shape == (3, 32, 32)
    for l in range(3):
        np.testing.assert_allclose(np.linalg.norm(np.asarray(frames[l])), 1.0,
                                   atol=1e-4)
    assert (np.asarray(norms) > 0).all()


def test_median_event_time():
    ts = jnp.asarray([1.0, 2.0, 5.0, 9.0, 100.0, 0.0, 0.0], jnp.float32)
    t = events.median_event_time(ts, jnp.asarray(5))
    assert float(t) == 5.0
