import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.utils import cameras as cam


def make_pinhole():
    return cam.Pinhole(fx=jnp.float32(200.0), fy=jnp.float32(210.0),
                       cx=jnp.float32(120.0), cy=jnp.float32(90.0),
                       width=240, height=180)


def test_project_backproject_roundtrip(rng):
    p = make_pinhole()
    uv = jnp.asarray(rng.uniform(5, 170, size=(64, 2)), jnp.float32)
    idp = jnp.asarray(rng.uniform(0.2, 2.0, size=64), jnp.float32)
    xyz = cam.backproject(p, uv, idp)
    uv2 = cam.project(p, xyz)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)


def test_radtan_invertible(rng):
    D = jnp.asarray([-0.3, 0.1, 1e-3, -1e-3, 0.0], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 2)), jnp.float32)
    xyd = cam.distort_radtan(xy, D)
    xyu = cam.undistort_radtan(xyd, D, iters=20)
    np.testing.assert_allclose(xy, xyu, atol=1e-4)


def test_equidistant_invertible(rng):
    D = jnp.asarray([-0.05, 0.01, -0.002, 0.0005], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(128, 2)), jnp.float32)
    xyd = cam.distort_equidistant(xy, D)
    xyu = cam.undistort_equidistant(xyd, D, iters=10)
    np.testing.assert_allclose(xy, xyu, atol=1e-4)


def test_fov_invertible(rng):
    D = jnp.asarray([0.9], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(64, 2)), jnp.float32)
    xyd = cam.distort_fov(xy, D)
    xyu = cam.undistort_fov(xyd, D)
    np.testing.assert_allclose(xy, xyu, atol=1e-4)


def test_forward_and_inverse_maps_consistent():
    """fwd(map) of the inverse map's source should return the output pixel."""
    p = make_pinhole()
    D = jnp.asarray([-0.2, 0.05, 0.0, 0.0, 0.0], jnp.float32)
    c = cam.CameraModel(pinhole=p, D=D, model="radtan")
    fwd_x, fwd_y = cam.forward_maps(c)
    inv_x, inv_y = cam.undistortion_maps(c)
    # pick an interior output pixel, look up its distorted source, then map back
    v, u = 90, 120
    sx, sy = float(inv_x[v, u]), float(inv_y[v, u])
    iu, iv = int(round(sx)), int(round(sy))
    # fwd map at the (rounded) source pixel should be near (u, v)
    assert abs(float(fwd_x[iv, iu]) - u) < 2.0
    assert abs(float(fwd_y[iv, iu]) - v) < 2.0


def test_pyramid_level_intrinsics():
    p = make_pinhole()
    p1 = p.pyramid_level(1)
    assert p1.width == 120 and p1.height == 90
    np.testing.assert_allclose(p1.fx, p.fx * 0.5)
    np.testing.assert_allclose(p1.cx, (p.cx + 0.5) * 0.5 - 0.5)


def test_gamma_table_roundtrip():
    g = np.linspace(0, 255, 256) ** 1.2
    B, Binv = cam.gamma_inverse_table(g)
    # B(Binv(x)) ~ x
    xs = np.arange(0, 256, 17, dtype=np.float32)
    vals = np.interp(np.asarray(Binv)[xs.astype(int)], np.arange(256), np.asarray(B))
    np.testing.assert_allclose(vals, xs, atol=1.0)


def test_kannala_brandt_matches_equidistant_and_inverts(rng):
    """The reference's UndistortKB (r = th + k0*th^3 + k1*th^5 + k2*th^7 +
    k3*th^9, src/utils/Undistort.cpp:1136-1183) is the same polynomial as
    UndistortEquidistant (thetad = th*(1 + k1*th^2 + ...), :1077-1118); the
    'kb' model alias must produce identical distortion and round-trip."""
    D = jnp.asarray([-0.04, 0.008, -0.0015, 0.0003], jnp.float32)
    xy = jnp.asarray(rng.uniform(-0.6, 0.6, size=(256, 2)), jnp.float32)

    # direct evaluation of the reference's KB polynomial form
    x, y = np.asarray(xy[:, 0], np.float64), np.asarray(xy[:, 1], np.float64)
    r = np.sqrt(x * x + y * y)
    th = np.arctan2(r, 1.0)
    k0, k1, k2, k3 = [float(v) for v in D]
    rd = th + k0 * th**3 + k1 * th**5 + k2 * th**7 + k3 * th**9
    s = np.where(r > 1e-8, rd / np.maximum(r, 1e-12), 1.0)
    ref = np.stack([x * s, y * s], -1)

    got = np.asarray(cam._DISTORT["kb"](xy, D))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    xyu = cam._UNDISTORT["kb"](jnp.asarray(ref, jnp.float32), D, iters=10)
    np.testing.assert_allclose(np.asarray(xyu), np.stack([x, y], -1),
                               atol=1e-4)


def test_calib_model_aliases_resolve():
    """'kannala_brandt' and 'equidistant' YAML names both bind to the KB
    kernel (closing Undistort.h:67-160's five-model set)."""
    from slam_eds_tpu.utils.calib import CameraInfo
    for name in ("kannala_brandt", "equidistant"):
        info = CameraInfo(width=240, height=180,
                          intrinsics=(200.0, 210.0, 120.0, 90.0),
                          D=(-0.04, 0.008, -0.0015, 0.0003),
                          distortion_model=name)
        m = info.to_model()
        assert m.model == "kb"
        assert cam._DISTORT[m.model] is cam.distort_equidistant
