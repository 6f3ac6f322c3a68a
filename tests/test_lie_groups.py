"""SO(2)/SE(2)/RxSO(3)/Sim(3) — parity with the reference's vendored Sophus
family (src/sophus/{so2,se2,rxso3,sim3}.hpp): exp/log round trips, group
axioms, adjoint identity, and Taylor-branch behavior near zero."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_eds_tpu.utils.lie_groups import (
    so2_exp, so2_log, se2_exp, se2_log, rxso3_exp, rxso3_log, Sim3, _sim3_W,
)
from slam_eds_tpu.utils.lie import so3_exp

KEY = jax.random.PRNGKey(7)


def test_so2_roundtrip():
    for theta in [-3.0, -0.5, 0.0, 1e-9, 0.7, 3.1]:
        R = so2_exp(jnp.asarray(theta))
        assert np.allclose(R @ R.T, np.eye(2), atol=1e-6)
        assert np.allclose(so2_log(R), theta, atol=1e-6)


def test_se2_roundtrip():
    taus = jax.random.normal(KEY, (32, 3))
    for tau in taus:
        R, t = se2_exp(tau)
        back = se2_log(R, t)
        assert np.allclose(back, tau, atol=1e-5), (tau, back)


def test_se2_small_angle():
    tau = jnp.array([0.3, -0.2, 1e-10])
    R, t = se2_exp(tau)
    # theta -> 0: pure translation
    assert np.allclose(t, tau[:2], atol=1e-6)
    assert np.allclose(se2_log(R, t), tau, atol=1e-6)


def test_rxso3_roundtrip():
    taus = jax.random.normal(KEY, (16, 4)) * jnp.array([1.0, 1.0, 1.0, 0.5])
    for tau in taus:
        sR = rxso3_exp(tau)
        s = float(jnp.cbrt(jnp.linalg.det(sR)))
        assert s > 0
        assert np.allclose(rxso3_log(sR), tau, atol=1e-5)


def test_sim3_W_matches_quadrature():
    """W = integral_0^1 e^{sigma u} exp(u w^) du, checked by fine quadrature
    (pure-numpy Rodrigues — per-step device dispatches made this the
    slowest test in the suite)."""
    def rodrigues(w):
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                      [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    rng = np.random.default_rng(0)
    for _ in range(8):
        w = rng.normal(size=3).astype(np.float32)
        sigma = np.float32(rng.normal() * 0.5)
        us = np.linspace(0, 1, 4001)
        acc = np.zeros((3, 3))
        for u in us:
            acc += np.exp(float(sigma) * u) * rodrigues(u * w)
        acc /= len(us)
        # trapezoid endpoint correction
        acc -= 0.5 * (np.eye(3)
                      + np.exp(float(sigma)) * rodrigues(w)) / len(us)
        W = np.asarray(_sim3_W(jnp.asarray(w), jnp.asarray(sigma)))
        assert np.allclose(W, acc, atol=2e-3), (W, acc)


@pytest.mark.parametrize("scale_tau", [1.0, 1e-6])
def test_sim3_roundtrip(scale_tau):
    taus = jax.random.normal(KEY, (16, 7)) * scale_tau
    for tau in taus:
        g = Sim3.exp(tau)
        assert np.allclose(g.log(), tau, atol=1e-4), (tau, g.log())


def test_sim3_group_axioms():
    a = Sim3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3, 0.15]))
    b = Sim3.exp(jnp.array([-0.3, 0.1, 0.2, -0.1, 0.25, 0.05, -0.2]))
    ab = a.compose(b)
    x = jnp.array([0.5, -1.0, 2.0])
    assert np.allclose(ab.apply(x), a.apply(b.apply(x)), atol=1e-5)
    ident = a.compose(a.inverse())
    assert np.allclose(ident.R, np.eye(3), atol=1e-5)
    assert np.allclose(ident.t, 0.0, atol=1e-5)
    assert np.allclose(ident.s, 1.0, atol=1e-5)


def test_sim3_adjoint_identity():
    """Adj_g tau == log(g * exp(tau) * g^-1) for small tau."""
    g = Sim3.exp(jnp.array([0.2, 0.1, -0.4, 0.3, -0.2, 0.1, 0.25]))
    tau = jnp.array([1e-3, -2e-3, 1.5e-3, 2e-3, -1e-3, 0.5e-3, 1e-3])
    lhs = g.adjoint() @ tau
    rhs = g.compose(Sim3.exp(tau)).compose(g.inverse()).log()
    assert np.allclose(lhs, rhs, atol=1e-5), (lhs, rhs)


def test_sim3_reduces_to_se3():
    """sigma = 0 must reproduce SE(3) exp (utils/lie.SE3)."""
    from slam_eds_tpu.utils.lie import SE3
    tau6 = jnp.array([0.3, -0.1, 0.5, 0.2, -0.4, 0.1])
    g = Sim3.exp(jnp.concatenate([tau6, jnp.zeros(1)]))
    e = SE3.exp(tau6)
    assert np.allclose(g.R, e.R, atol=1e-6)
    assert np.allclose(g.t, e.t, atol=1e-6)
    assert np.allclose(g.s, 1.0, atol=1e-6)


def test_sim3_W_taylor_branch():
    """theta^2, sigma^2 < 1e-8 take the double-Taylor branch of _sim3_W;
    its first-order coefficients must match the series of the closed forms
    A = (e^s(s-1)+1)/s^2 = 1/2 + s/3 + s^2/8 + ...
    B = (e^s(s^2/2-s+1)-1)/s^3 = 1/6 + s/8 + s^2/20 + ...
    (round-2 advisor finding). Run in f64 so B is resolvable from W."""
    jax.config.update("jax_enable_x64", True)
    try:
        th = 9e-5  # near the branch edge: first-order term matters most
        w = jnp.asarray([th, 0.0, 0.0], jnp.float64)
        for s in (1e-5, -1e-5, 9e-5, -9e-5):
            W = np.asarray(_sim3_W(w, jnp.asarray(s, jnp.float64)))
            # W = C I + A w^ + B w^2 with w = [th,0,0]:
            #   W[2,1] = A th,  W[0,0]-W[1,1] = B th^2
            A = W[2, 1] / th
            B = (W[0, 0] - W[1, 1]) / th ** 2
            # branch is first-order: allow its s^2/8 ~ 1e-9 truncation;
            # the s/6-vs-s/3 bug would be >= 1.6e-6
            assert abs(A - (0.5 + s / 3.0 + s * s / 8.0)) < 1e-8, (s, A)
            # extraction floor: B comes from cancelling two ~1.0 entries of
            # W (eps/theta^2 ~ 3e-8); the s/24-vs-s/8 bug would be >= 8e-7
            assert abs(B - (1.0 / 6.0 + s / 8.0 + s * s / 20.0)) < 5e-8, (s, B)
    finally:
        jax.config.update("jax_enable_x64", False)
