import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.utils import klt, image


def textured(rng, H=96, W=128):
    ys, xs = np.mgrid[0:H, 0:W]
    img = (np.sin(xs * 0.3) * np.cos(ys * 0.25)
           + 0.5 * np.sin(xs * 0.07 + ys * 0.09)) * 100 + 128
    return jnp.asarray(img, jnp.float32)


def shift_image(img, dx, dy):
    from slam_eds_tpu.utils.interp import bilinear
    H, W = img.shape
    ys, xs = np.mgrid[0:H, 0:W]
    return bilinear(img, jnp.asarray(xs - dx, jnp.float32),
                    jnp.asarray(ys - dy, jnp.float32))


def test_klt_recovers_subpixel_shift(rng):
    img = textured(rng)
    shifted = shift_image(img, 1.3, -0.7)
    uv = jnp.asarray(np.stack([rng.uniform(15, 110, 50),
                               rng.uniform(15, 80, 50)], -1), jnp.float32)
    uv_new, ok, res = klt.klt_track(img, shifted, uv, iterations=20)
    d = np.asarray(uv_new - uv)[np.asarray(ok)]
    np.testing.assert_allclose(d.mean(0), [1.3, -0.7], atol=0.05)


def test_klt_pyramid_large_shift(rng):
    img = textured(rng)
    shifted = shift_image(img, 6.0, 4.0)
    uv = jnp.asarray(np.stack([rng.uniform(20, 100, 40),
                               rng.uniform(20, 70, 40)], -1), jnp.float32)
    pyr_ref = [l[..., 0] for l in image.build_pyramid(img, 3)[0]]
    pyr_new = [l[..., 0] for l in image.build_pyramid(jnp.asarray(shifted), 3)[0]]
    uv_new, ok, _ = klt.klt_track_pyramid(pyr_ref, pyr_new, uv)
    d = np.asarray(uv_new - uv)[np.asarray(ok)]
    assert len(d) > 20
    np.testing.assert_allclose(np.median(d, 0), [6.0, 4.0], atol=0.2)


def test_similarity_measures():
    a = jnp.asarray([[1.0, 2.0, 3.0]])
    b = jnp.asarray([[2.0, 4.0, 6.0]])
    np.testing.assert_allclose(klt.ncc(a, b), [1.0], atol=1e-6)
    np.testing.assert_allclose(klt.zncc(a, b), [1.0], atol=1e-6)
    assert float(klt.ssd(a, b)[0]) == 14.0
    assert float(klt.sad(a, b)[0]) == 6.0
    assert float(klt.zssd(a, a)[0]) == 0.0


def test_epiline_search_finds_shift(rng):
    img = textured(rng)
    shifted = shift_image(img, 3.0, 0.0)
    uv = jnp.asarray(np.stack([rng.uniform(20, 100, 30),
                               rng.uniform(20, 70, 30)], -1), jnp.float32)
    dirs = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (30, 1))
    uv_best, score = klt.search_along_epiline(img, shifted, uv, dirs,
                                              search_range=6.0,
                                              num_steps=49)
    d = np.asarray(uv_best - uv)
    np.testing.assert_allclose(np.median(d[:, 0]), 3.0, atol=0.3)
    assert (np.asarray(score) > 0.8).mean() > 0.8


def test_match_template_finds_shift(rng):
    from slam_eds_tpu.utils.klt import match_template
    H, W = 64, 80
    img = rng.normal(size=(H, W)).astype(np.float32)
    img = np.asarray(jnp.asarray(img))
    # new image = ref shifted by integer (3, -2)
    new = np.roll(np.roll(img, -2, axis=0), 3, axis=1)
    uv0 = np.stack([rng.uniform(15, W - 15, 20),
                    rng.uniform(15, H - 15, 20)], -1).astype(np.float32)
    uv, score = match_template(jnp.asarray(img), jnp.asarray(new),
                               jnp.asarray(uv0), radius=3, search_radius=6)
    np.testing.assert_allclose(np.asarray(uv), uv0 + np.asarray([3.0, -2.0]),
                               atol=1e-4)
    assert np.all(np.asarray(score) > 0.95)


def test_epiline_direction_consistent_with_projection(rng):
    """Points along the epipolar line in the target must project from the
    ref ray: check that warped points at different depths lie along the
    returned direction."""
    from slam_eds_tpu.utils.klt import fundamental_from_pose, \
        epiline_directions
    from slam_eds_tpu.utils.lie import SE3
    fx = fy = 100.0
    cx, cy = 40.0, 30.0
    K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    T = SE3.exp(jnp.asarray([0.05, -0.02, 0.01, 0.01, -0.005, 0.02],
                            jnp.float32))
    uv = jnp.asarray([[45.0, 28.0], [30.0, 40.0]], jnp.float32)
    F = fundamental_from_pose(T, K)
    d = epiline_directions(F, uv)

    # project the ray at two depths
    for i in range(uv.shape[0]):
        x = (uv[i, 0] - cx) / fx
        y = (uv[i, 1] - cy) / fy
        ps = []
        for z in (2.0, 6.0):
            X = jnp.asarray([x * z, y * z, z], jnp.float32)
            Xw = T.R @ X + T.t
            ps.append(np.asarray([float(fx * Xw[0] / Xw[2] + cx),
                                  float(fy * Xw[1] / Xw[2] + cy)]))
        seg = ps[1] - ps[0]
        seg = seg / np.linalg.norm(seg)
        cosang = abs(float(seg @ np.asarray(d[i])))
        assert cosang > 0.999, (i, cosang)


def test_optimal_k_crop_remaps_inside(rng):
    from slam_eds_tpu.utils.cameras import (CameraModel, Pinhole,
                                            optimal_k_crop,
                                            undistortion_maps)
    W, H = 128, 96
    pin = Pinhole(jnp.float32(90.0), jnp.float32(90.0), jnp.float32(63.5),
                  jnp.float32(47.5), W, H)
    cam = CameraModel(pin, jnp.asarray([-0.28, 0.07, 0.0, 0.0], jnp.float32),
                      "radtan")
    out = optimal_k_crop(cam, W, H)
    mx, my = undistortion_maps(cam, out)
    mx, my = np.asarray(mx), np.asarray(my)
    assert mx.min() >= -0.51 and mx.max() <= W - 0.49, (mx.min(), mx.max())
    assert my.min() >= -0.51 and my.max() <= H - 0.49, (my.min(), my.max())
    # and the crop should not be degenerate (covers most of the image)
    assert float(out.fx) > 0.7 * 90.0
