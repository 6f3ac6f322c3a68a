import numpy as np
import jax
import jax.numpy as jnp

from slam_eds_tpu.utils import interp


def test_bilinear_exact_on_plane(rng):
    """Bilinear interpolation is exact for affine images."""
    H, W = 32, 40
    ys, xs = np.mgrid[0:H, 0:W]
    img = jnp.asarray(1.5 * xs - 0.7 * ys + 3.0, jnp.float32)
    x = jnp.asarray(rng.uniform(1, W - 2, size=50), jnp.float32)
    y = jnp.asarray(rng.uniform(1, H - 2, size=50), jnp.float32)
    v = interp.bilinear(img, x, y)
    np.testing.assert_allclose(v, 1.5 * x - 0.7 * y + 3.0, rtol=1e-5, atol=1e-4)


def test_bilinear_at_integers(rng):
    img = jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)
    v = interp.bilinear(img, jnp.asarray([3.0, 7.0]), jnp.asarray([2.0, 9.0]))
    np.testing.assert_allclose(v, [img[2, 3], img[9, 7]], atol=1e-6)


def test_bicubic_exact_on_cubic_poly(rng):
    """Catmull-Rom convolution reproduces cubics along each axis exactly
    (separable kernel, order-3 accuracy on polynomials up to degree 3 in
    each variable separately)."""
    H, W = 32, 32
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    img = jnp.asarray(0.01 * xs ** 3 - 0.05 * xs ** 2 + xs + 2.0, jnp.float32)
    x = jnp.asarray(rng.uniform(3, W - 4, size=30), jnp.float32)
    y = jnp.asarray(rng.uniform(3, H - 4, size=30), jnp.float32)
    f, dfdx, dfdy = interp.bicubic_with_grad(img, x, y)
    xe = np.asarray(x, np.float64)
    np.testing.assert_allclose(f, 0.01 * xe ** 3 - 0.05 * xe ** 2 + xe + 2.0,
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(dfdx, 0.03 * xe ** 2 - 0.1 * xe + 1.0,
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(dfdy, np.zeros_like(xe), atol=1e-2)


def test_bicubic_grad_matches_autodiff(rng):
    img = jnp.asarray(rng.normal(size=(24, 24)), jnp.float32)

    def f(x, y):
        return interp.bicubic(img, x, y)

    x0, y0 = 11.3, 7.8
    _, dx, dy = interp.bicubic_with_grad(img, jnp.float32(x0), jnp.float32(y0))
    gx = jax.grad(f, argnums=0)(jnp.float32(x0), jnp.float32(y0))
    gy = jax.grad(f, argnums=1)(jnp.float32(x0), jnp.float32(y0))
    np.testing.assert_allclose(dx, gx, atol=1e-4)
    np.testing.assert_allclose(dy, gy, atol=1e-4)


def test_bilinear_3channel(rng):
    img3 = jnp.asarray(rng.normal(size=(16, 16, 3)), jnp.float32)
    v = interp.bilinear_3(img3, jnp.asarray([4.5]), jnp.asarray([5.5]))
    assert v.shape == (1, 3)
    expect = 0.25 * (img3[5, 4] + img3[5, 5] + img3[6, 4] + img3[6, 5])
    np.testing.assert_allclose(v[0], expect, atol=1e-5)
