import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops import depth_filter as df
from slam_eds_tpu.utils.cameras import Pinhole, project, backproject
from slam_eds_tpu.utils.lie import SE3

CAM = Pinhole(jnp.float32(120.0), jnp.float32(120.0), jnp.float32(63.5),
              jnp.float32(47.5), 128, 96)


def test_triangulation_exact(rng):
    """Noise-free correspondences -> exact inverse depth."""
    n = 64
    uv_kf = jnp.asarray(np.stack([rng.uniform(20, 100, n),
                                  rng.uniform(20, 76, n)], -1), jnp.float32)
    idp_true = jnp.asarray(rng.uniform(0.3, 0.8, n), jnp.float32)
    X = backproject(CAM, uv_kf, idp_true)
    T_kf_ef = SE3.exp(jnp.asarray([0.08, -0.03, 0.02, 0.01, 0.02, -0.01],
                                  jnp.float32))
    # point in event frame: X_ef = T_ef_kf * X
    X_ef = T_kf_ef.inverse().apply(X)
    uv_ef = project(CAM, X_ef)
    idp = df.triangulate_inv_depth(uv_kf, uv_ef, CAM, T_kf_ef)
    np.testing.assert_allclose(np.asarray(idp), np.asarray(idp_true),
                               rtol=1e-3)


def test_tau_positive_and_reasonable(rng):
    T = SE3.exp(jnp.asarray([0.1, 0.0, 0.0, 0, 0, 0], jnp.float32))
    x_norm = jnp.asarray([[0.1, -0.05]], jnp.float32)
    z = jnp.asarray([2.0], jnp.float32)
    ang = df.angle_error(3.0, CAM.fx, CAM.fy)
    tau = df.compute_tau(T, x_norm, z, ang)
    assert float(tau[0]) > 0
    assert float(tau[0]) < 2.0  # sane for 10cm baseline at 2m


def test_vogiatzis_converges_to_truth(rng):
    n = 128
    state = df.init_uniform(n, 0.5, 4.0)
    z_true = jnp.asarray(rng.uniform(0.4, 1.2, n), jnp.float32)
    mu_range = 3.5
    for _ in range(40):
        z_meas = z_true * (1 + 0.02 * jnp.asarray(rng.normal(size=n),
                                                  jnp.float32))
        tau2 = jnp.full((n,), 0.01, jnp.float32)
        state = df.vogiatzis_update(state, z_meas, tau2, mu_range,
                                    jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(z_true),
                               rtol=0.05)
    assert bool(df.converged(state, mu_range, 50.0).mean() > 0.9)


def test_vogiatzis_rejects_outliers(rng):
    """With 40% outlier measurements the inlier ratio a/(a+b) drops but mu
    stays near truth (the Beta mixture downweights the uniform component)."""
    n = 64
    state = df.init_uniform(n, 0.5, 4.0)
    z_true = jnp.full((n,), 0.7, jnp.float32)
    for i in range(40):
        outlier = rng.uniform(size=n) < 0.4
        z = np.where(outlier, rng.uniform(0.25, 2.0, n), 0.7 + 0.01 * rng.normal(size=n))
        state = df.vogiatzis_update(state, jnp.asarray(z, jnp.float32),
                                    jnp.full((n,), 0.005, jnp.float32), 3.5,
                                    jnp.ones(n, bool))
    med = float(jnp.median(state.mu))
    assert abs(med - 0.7) < 0.05, med


def test_guards_keep_state_finite():
    state = df.DepthFilterState(mu=jnp.asarray([0.5, 0.5]),
                                sigma2=jnp.asarray([0.01, 0.01]),
                                a=jnp.asarray([2.0, 2.0]),
                                b=jnp.asarray([5.0, 5.0]))
    # absurd measurements
    z = jnp.asarray([-5.0, jnp.nan])
    tau2 = jnp.asarray([1e-9, 0.01])
    out = df.vogiatzis_update(state, z, tau2, 3.5, jnp.ones(2, bool))
    assert np.isfinite(np.asarray(out.mu)).all()
    assert np.isfinite(np.asarray(out.sigma2)).all()


def test_full_update_improves_estimate(rng):
    n = 96
    uv_kf = jnp.asarray(np.stack([rng.uniform(20, 100, n),
                                  rng.uniform(20, 76, n)], -1), jnp.float32)
    idp_true = jnp.asarray(rng.uniform(0.4, 0.8, n), jnp.float32)
    X = backproject(CAM, uv_kf, idp_true)
    state = df.init_uniform(n, 0.5, 4.0)
    err0 = float(jnp.abs(state.mu - idp_true).mean())
    for k in range(16):
        tau = np.concatenate([rng.uniform(-0.15, 0.15, 3),
                              rng.uniform(-0.02, 0.02, 3)])
        T_kf_ef = SE3.exp(jnp.asarray(tau, jnp.float32))
        uv_ef = project(CAM, T_kf_ef.inverse().apply(X))
        tracks = uv_ef - uv_kf + 0.3 * jnp.asarray(rng.normal(size=(n, 2)),
                                                   jnp.float32)
        state = df.update(state, T_kf_ef, uv_kf, tracks, CAM, mu_range=3.5)
    err1 = float(jnp.abs(state.mu - idp_true).mean())
    assert err1 < 0.5 * err0, (err0, err1)
