import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops.distance_map import coarse_distance_map, sample_distance


def test_distances_are_l1():
    H, W = 32, 48
    uv = jnp.asarray([[10.0, 8.0], [40.0, 25.0]], jnp.float32)
    mask = jnp.ones(2, bool)
    d = np.asarray(coarse_distance_map(uv, mask, H, W, max_dist=60))
    ys, xs = np.mgrid[0:H, 0:W]
    want = np.minimum(np.abs(xs - 10) + np.abs(ys - 8),
                      np.abs(xs - 40) + np.abs(ys - 25)).astype(np.float32)
    np.testing.assert_allclose(d, want)


def test_clamped_and_masked():
    H, W = 16, 16
    uv = jnp.asarray([[2.0, 2.0], [12.0, 12.0]], jnp.float32)
    mask = jnp.asarray([True, False])
    d = np.asarray(coarse_distance_map(uv, mask, H, W, max_dist=5))
    assert d[2, 2] == 0
    assert d[12, 12] > 0            # masked point contributes nothing
    assert d.max() == 5             # clamp

    s = sample_distance(jnp.asarray(d), jnp.asarray([[2.0, 2.0], [9.0, 2.0]]))
    assert float(s[0]) == 0 and float(s[1]) == 5


def test_out_of_frame_points_ignored():
    H, W = 8, 8
    uv = jnp.asarray([[-3.0, 2.0], [100.0, 2.0]], jnp.float32)
    d = np.asarray(coarse_distance_map(uv, jnp.ones(2, bool), H, W,
                                       max_dist=4))
    assert d.min() == 4
