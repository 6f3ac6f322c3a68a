import numpy as np
import jax.numpy as jnp
import pytest

from slam_eds_tpu.utils import image


def test_sobel_kernels_match_opencv():
    d3, s3 = image.sobel_kernels(3)
    np.testing.assert_array_equal(d3, [-1, 0, 1])
    np.testing.assert_array_equal(s3, [1, 2, 1])
    d7, s7 = image.sobel_kernels(7)
    np.testing.assert_array_equal(d7, [-1, -4, -5, 0, 5, 4, 1])
    np.testing.assert_array_equal(s7, [1, 6, 15, 20, 15, 6, 1])


def test_sobel_on_ramp(rng):
    H, W = 24, 24
    ys, xs = np.mgrid[0:H, 0:W]
    img = jnp.asarray(2.0 * xs + 1.0 * ys, jnp.float32)
    gx, gy = image.sobel(img, 3)
    # interior: Sobel3 of ramp slope a is 8a
    np.testing.assert_allclose(gx[4:-4, 4:-4], 16.0, atol=1e-4)
    np.testing.assert_allclose(gy[4:-4, 4:-4], 8.0, atol=1e-4)


def test_sobel_matches_cv2_if_available(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.normal(size=(32, 40)).astype(np.float32)
    for k in (3, 7):
        gx_ref = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=k)
        gx = image.sobel(jnp.asarray(img), k)[0]
        np.testing.assert_allclose(gx, gx_ref, atol=1e-3)


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.normal(size=(32, 32)), jnp.float32)
    out = image.gaussian_blur(img, 5)
    np.testing.assert_allclose(jnp.mean(out), jnp.mean(img), atol=1e-2)


def test_pyramid_shapes(rng):
    img = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    levels, abs_sq = image.build_pyramid(img, 4)
    assert [l.shape for l in levels] == [(64, 96, 3), (32, 48, 3),
                                         (16, 24, 3), (8, 12, 3)]
    assert abs_sq[0].shape == (64, 96)


def test_central_gradients_on_ramp():
    H, W = 16, 16
    ys, xs = np.mgrid[0:H, 0:W]
    img = jnp.asarray(3.0 * xs - 2.0 * ys, jnp.float32)
    gx, gy = image.central_gradients(img)
    np.testing.assert_allclose(gx[1:-1, 1:-1], 3.0, atol=1e-5)
    np.testing.assert_allclose(gy[1:-1, 1:-1], -2.0, atol=1e-5)


def test_minmax_and_log():
    img = jnp.asarray([[0.0, 2.0], [4.0, 8.0]], jnp.float32)
    n = image.minmax_normalize(img)
    assert float(n.min()) == 0.0 and abs(float(n.max()) - 1.0) < 1e-6
    l = image.log_image(n, 0.2)
    np.testing.assert_allclose(l[0, 0], np.log(0.2), atol=1e-6)


def test_dilate_erode(rng):
    img = jnp.zeros((9, 9), jnp.float32).at[4, 4].set(1.0)
    d = image.dilate3(img)
    assert float(d[3, 3]) == 1.0 and float(d[4, 6]) == 0.0
    e = image.erode3(d)
    assert float(e[4, 4]) == 1.0 and float(e[3, 3]) == 0.0


def test_pattern_dso8():
    assert image.PATTERN_DSO8.shape == (8, 2)
    assert (np.abs(image.PATTERN_DSO8) <= image.PATTERN_PAD).all()
    assert [0, 0] in image.PATTERN_DSO8.tolist()


def test_split_image_in_patches():
    """splitImageInPatches parity (Utils.cpp:608-661): integer centers give
    exact crops; border points are masked."""
    from slam_eds_tpu.utils.image import split_image_in_patches
    img = jnp.asarray(np.arange(20 * 30, dtype=np.float32).reshape(20, 30))
    uv = jnp.asarray([[5.0, 7.0], [1.0, 1.0], [28.0, 18.0]])
    patches, ok = split_image_in_patches(img, uv, patch_radius=2)
    assert patches.shape == (3, 5, 5)
    ref = np.asarray(img)[5:10, 3:8]
    assert np.allclose(patches[0], ref)
    assert bool(ok[0]) and not bool(ok[1]) and not bool(ok[2])


def test_pyramid_patches_levels():
    from slam_eds_tpu.utils.image import build_pyramid, pyramid_patches
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    pyr, _ = build_pyramid(img, 3)
    levels = [l[..., 0] for l in pyr]
    uv = jnp.asarray([[32.0, 32.0], [16.0, 48.0]])
    out = pyramid_patches(levels, uv, patch_radius=1)
    assert len(out) == 3
    for l, (p, ok) in enumerate(out):
        assert p.shape == (2, 3, 3)
        # center tap equals direct image lookup at uv / 2^l
        c = np.asarray(levels[l])[int(32 / 2 ** l), int(32 / 2 ** l)]
        assert abs(float(p[0, 1, 1]) - float(c)) < 1e-4


def test_compute_bundle_patches():
    """computeBundlePatches (Utils.cpp:675-734): DSO 8-pattern colors."""
    from slam_eds_tpu.utils.image import (compute_bundle_patches,
                                          PATTERN_DSO8)
    img = jnp.asarray(np.arange(16 * 16, dtype=np.float32).reshape(16, 16))
    uv = jnp.asarray([[8.0, 8.0]])
    vals, ok = compute_bundle_patches(img, uv)
    assert vals.shape == (1, 8) and bool(ok[0])
    for k, (dx, dy) in enumerate(PATTERN_DSO8):
        assert float(vals[0, k]) == float(img[8 + dy, 8 + dx])
