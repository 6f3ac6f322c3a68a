import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops import initializer as init
from slam_eds_tpu.utils.lie import SE3


def two_view(rng, n=200, outlier_frac=0.0, noise=0.0):
    X = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                  rng.uniform(2.0, 5.0, n)], -1).astype(np.float32)
    T_21 = SE3.exp(jnp.asarray([0.25, 0.05, -0.1, 0.02, -0.03, 0.01],
                               jnp.float32))
    # normalize translation (E is scale-free; recoverPose returns unit t)
    t_norm = float(jnp.linalg.norm(T_21.t))
    X = X / t_norm
    T_21 = SE3(T_21.R, T_21.t / t_norm)
    X2 = np.asarray(T_21.apply(jnp.asarray(X)))
    x1 = X[:, :2] / X[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    if noise:
        x1 = x1 + rng.normal(size=x1.shape).astype(np.float32) * noise
        x2 = x2 + rng.normal(size=x2.shape).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        x2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    return (jnp.asarray(x1), jnp.asarray(x2), T_21,
            jnp.asarray(X[:, 2], jnp.float32))


def test_eight_point_exact(rng):
    x1, x2, T_21, _ = two_view(rng)
    E = init.eight_point(x1, x2)
    d = init.sampson_distance(E, x1, x2)
    assert float(jnp.max(d)) < 1e-5  # float32 SVD noise floor


def test_ransac_with_outliers(rng):
    x1, x2, T_21, _ = two_view(rng, outlier_frac=0.3, noise=1e-4)
    E, inl, n = init.ransac_essential(x1, x2, jnp.ones(x1.shape[0], bool),
                                      jnp.asarray(0), threshold=1e-5)
    inl = np.asarray(inl)
    assert int(n) > 100
    # outliers (first 30%) mostly rejected
    assert inl[:60].mean() < 0.2
    assert inl[60:].mean() > 0.8


def test_recover_pose_and_triangulate(rng):
    x1, x2, T_21, z_true = two_view(rng, noise=0.0)
    res = init.bootstrap_eight_point(x1, x2, jnp.ones(x1.shape[0], bool))
    assert bool(res.success)
    # rotation exact, translation up to sign*scale (mean-idepth-1 gauge)
    R_err = np.asarray(T_21.R) @ np.asarray(res.T_21.R).T
    assert abs(np.trace(R_err) - 3.0) < 1e-3
    t_est = np.asarray(res.T_21.t)
    t_true = np.asarray(T_21.t)
    cos = abs(np.dot(t_est, t_true)
              / (np.linalg.norm(t_true) * np.linalg.norm(t_est)))
    assert cos > 0.999
    # depths proportional to truth; gauge: mean inlier inverse depth == 1
    m = np.asarray(res.inliers)
    rel = np.asarray(1.0 / res.idepth)[m] / np.asarray(z_true)[m]
    assert rel.std() / rel.mean() < 0.02
    assert abs(np.asarray(res.idepth)[m].mean() - 1.0) < 1e-3


def test_bootstrap_fails_on_garbage(rng):
    x1 = jnp.asarray(rng.uniform(-0.5, 0.5, (60, 2)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(-0.5, 0.5, (60, 2)), jnp.float32)
    res = init.bootstrap_eight_point(x1, x2, jnp.ones(60, bool),
                                     threshold=1e-7)
    assert int(res.inliers.sum()) < 30
