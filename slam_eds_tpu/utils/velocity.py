"""Twist/velocity integration utilities.

Replaces ``eds::utils::veloIntegration`` (reference src/utils/Utils.hpp:
459-515): integrate a body twist (linear + angular velocity) over dt with a
4th-order quaternion integrator, producing the pose increment used to
predict the next event-frame pose from the tracker's velocity state.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import lie
from .lie import SE3


def quat_integrate_rk4(q, omega, dt):
    """4th-order Runge-Kutta integration of dq/dt = 0.5 * q ⊗ [0, omega]
    with constant omega (the reference's 4th-order quaternion integrator)."""
    def deriv(qi):
        return 0.5 * lie.quat_mul(qi, jnp.concatenate([jnp.zeros(1, q.dtype),
                                                       omega]))
    k1 = deriv(q)
    k2 = deriv(q + 0.5 * dt * k1)
    k3 = deriv(q + 0.5 * dt * k2)
    k4 = deriv(q + dt * k3)
    q_new = q + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return lie.quat_normalize(q_new)


def velo_integration(T: SE3, velo, dt):
    """Integrate a 6-dof twist velo = [v(3), w(3)] (body frame) over dt on a
    pose T: rotation via RK4 quaternion integration, translation via the
    rotated linear velocity. Returns the predicted pose."""
    q = lie.mat_to_quat(T.R)
    q_new = quat_integrate_rk4(q, velo[3:6], dt)
    t_new = T.t + T.R @ (velo[:3] * dt)
    return SE3(lie.quat_to_mat(q_new), t_new)


def twist_from_relative(T_prev: SE3, T_cur: SE3, dt):
    """Recover the average body twist between consecutive poses."""
    rel = T_prev.inverse().compose(T_cur)
    return rel.log() / jnp.maximum(dt, 1e-9)
