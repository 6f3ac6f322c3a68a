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
