import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_eds_tpu.utils import lie
from slam_eds_tpu.utils.lie import SE3


def random_se3(rng, scale_rot=1.0, scale_t=1.0):
    w = rng.normal(size=3) * scale_rot
    v = rng.normal(size=3) * scale_t
    return SE3.exp(jnp.asarray(np.concatenate([v, w]), jnp.float32))


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.5, 2.0, 3.0]:
        w = jnp.asarray(rng.normal(size=3) * scale, jnp.float32)
        R = lie.so3_exp(w)
        # orthonormal
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        np.testing.assert_allclose(R, R2, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(10):
        tau = jnp.asarray(rng.normal(size=6), jnp.float32)
        T = SE3.exp(tau)
        tau2 = T.log()
        np.testing.assert_allclose(tau, tau2, atol=1e-4)


def test_se3_compose_inverse(rng):
    A = random_se3(rng)
    B = random_se3(rng)
    C = A.compose(B)
    x = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_allclose(C.apply(x), A.apply(B.apply(x)), atol=1e-5)
    I = A.compose(A.inverse())
    np.testing.assert_allclose(I.R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(I.t, np.zeros(3), atol=1e-5)


def test_adjoint_identity(rng):
    """Adj(T) tau == log(T exp(tau) T^-1) for small tau."""
    T = random_se3(rng)
    tau = jnp.asarray(rng.normal(size=6) * 1e-3, jnp.float32)
    lhs = T.adjoint() @ tau
    rhs = T.compose(SE3.exp(tau)).compose(T.inverse()).log()
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_quat_mat_consistency(rng):
    for _ in range(5):
        w = jnp.asarray(rng.normal(size=3), jnp.float32)
        R = lie.so3_exp(w)
        q = lie.mat_to_quat(R)
        np.testing.assert_allclose(lie.quat_to_mat(q), R, atol=1e-5)
        v = jnp.asarray(rng.normal(size=3), jnp.float32)
        np.testing.assert_allclose(lie.quat_rotate(q, v), R @ v, atol=1e-5)


def test_quat_mul_matches_mat_mul(rng):
    w1 = jnp.asarray(rng.normal(size=3), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=3), jnp.float32)
    R1, R2 = lie.so3_exp(w1), lie.so3_exp(w2)
    q = lie.quat_mul(lie.mat_to_quat(R1), lie.mat_to_quat(R2))
    np.testing.assert_allclose(lie.quat_to_mat(q), R1 @ R2, atol=1e-5)


def test_exp_jittable():
    f = jax.jit(SE3.exp)
    T = f(jnp.zeros(6))
    np.testing.assert_allclose(T.R, np.eye(3), atol=1e-6)


def test_vmap_batch(rng):
    taus = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
    Ts = jax.vmap(SE3.exp)(taus)
    assert Ts.R.shape == (16, 3, 3)
    logs = jax.vmap(SE3.log)(Ts)
    np.testing.assert_allclose(logs, taus, atol=1e-4)
