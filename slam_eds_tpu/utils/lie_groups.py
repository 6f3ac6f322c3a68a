"""Remaining Lie groups of the reference's vendored Sophus: SO(2), SE(2),
R⁺×SO(3) and Sim(3) (reference ``src/sophus/{so2,se2,rxso3,sim3}.hpp``).

The core odometry path only needs SO(3)/SE(3) (``utils/lie.py``), but the
reference ships the full Sophus family — Sim(3) in particular is the natural
group for scale-drift-aware trajectory alignment (monocular scale is a gauge
freedom of the photometric BA, see the scale nullspace in ``ops/energy``).

Conventions match Sophus:

* SE(2) tangent is ``[upsilon(2), theta]``.
* RxSO(3) tangent is ``[omega(3), sigma]`` with scale ``s = exp(sigma)``.
* Sim(3) tangent is ``[upsilon(3), omega(3), sigma]``; ``exp`` composes a
  scaled rotation ``s·R`` with translation ``t = W(omega, sigma) @ upsilon``
  where ``W = ∫₀¹ e^{σu} exp(u·ω̂) du`` (the closed form the reference
  evaluates in ``sim3.hpp:609`` ``calcW``).

Everything is jit/vmap-safe: no data-dependent branching, Taylor fallbacks via
``jnp.where`` with guarded denominators (same discipline as ``utils/lie.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from typing import NamedTuple

from .lie import hat, so3_exp, so3_log, _EPS


# ---------------------------------------------------------------------------
# SO(2) — reference src/sophus/so2.hpp
# ---------------------------------------------------------------------------

def so2_exp(theta):
    """Angle -> 2x2 rotation matrix."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def so2_log(R):
    """2x2 rotation matrix -> angle in (-pi, pi]."""
    return jnp.arctan2(R[1, 0], R[0, 0])


# ---------------------------------------------------------------------------
# SE(2) — reference src/sophus/se2.hpp
# ---------------------------------------------------------------------------

def _se2_V(theta):
    """SE(2) left Jacobian: t = V(theta) @ upsilon."""
    t2 = theta * theta
    small = t2 < _EPS
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    B = jnp.where(small, 0.5 * theta - t2 * theta / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta))
    return jnp.stack([jnp.stack([A, -B]), jnp.stack([B, A])])


def se2_exp(tau):
    """Tangent [ux, uy, theta] -> (R[2,2], t[2])."""
    u, theta = tau[:2], tau[2]
    return so2_exp(theta), _se2_V(theta) @ u


def se2_log(R, t):
    """(R, t) -> tangent [ux, uy, theta]."""
    theta = so2_log(R)
    V = _se2_V(theta)
    # 2x2 inverse, det(V) = A^2 + B^2 > 0 for theta in (-pi, pi]
    det = V[0, 0] * V[1, 1] - V[0, 1] * V[1, 0]
    Vinv = jnp.stack([jnp.stack([V[1, 1], -V[0, 1]]),
                      jnp.stack([-V[1, 0], V[0, 0]])]) / (det + _EPS * _EPS)
    return jnp.concatenate([Vinv @ t, theta[None]])


# ---------------------------------------------------------------------------
# RxSO(3) — scaled rotations, reference src/sophus/rxso3.hpp
# ---------------------------------------------------------------------------

def rxso3_exp(tau):
    """Tangent [omega(3), sigma] -> scaled rotation matrix s*R."""
    w, sigma = tau[:3], tau[3]
    return jnp.exp(sigma) * so3_exp(w)


def rxso3_log(sR):
    """Scaled rotation matrix -> [omega(3), sigma]."""
    s = jnp.cbrt(jnp.linalg.det(sR))
    R = sR / (s + _EPS * _EPS)
    return jnp.concatenate([so3_log(R), jnp.log(s)[None]])


# ---------------------------------------------------------------------------
# Sim(3) — reference src/sophus/sim3.hpp
# ---------------------------------------------------------------------------

def _sim3_W(w, sigma):
    """W = ∫₀¹ e^{σu} exp(u ω̂) du = C·I + A·ω̂ + B·ω̂², the matrix coupling
    translation and [rotation, scale] in Sim(3) exp (sim3.hpp:609 calcW).

    Closed forms from the integrals
      C   = (e^σ - 1)/σ
      I_s = ∫ e^{σu} sin(uθ) du = (e^σ(σ sinθ - θ cosθ) + θ)/(σ² + θ²)
      I_c = ∫ e^{σu} cos(uθ) du = (e^σ(σ cosθ + θ sinθ) - σ)/(σ² + θ²)
      A = I_s/θ,  B = (C - I_c)/θ²
    with Taylor fallbacks when θ and/or σ vanish.
    """
    dtype = w.dtype
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    sigma2 = sigma * sigma
    es = jnp.exp(sigma)
    small_t = theta2 < _EPS
    small_s = sigma2 < _EPS

    # C = (e^sigma - 1)/sigma, Taylor: 1 + sigma/2 + sigma^2/6
    C = jnp.where(small_s, 1.0 + 0.5 * sigma + sigma2 / 6.0,
                  (es - 1.0) / jnp.where(small_s, 1.0, sigma))

    denom = sigma2 + theta2
    safe_denom = jnp.where(denom < _EPS, 1.0, denom)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    A_main = (es * (sigma * sin_t - theta * cos_t) + theta) / (theta * safe_denom)
    # theta -> 0, sigma != 0:  A = (e^sigma (sigma - 1) + 1)/sigma^2
    A_st = (es * (sigma - 1.0) + 1.0) / jnp.where(small_s, 1.0, sigma2)
    # theta,sigma -> 0: expand (e^s(s-1)+1)/s^2 = 1/2 + s/3 + O(s^2)
    A_both = jnp.asarray(0.5, dtype) + sigma / 3.0
    A = jnp.where(small_t, jnp.where(small_s, A_both, A_st), A_main)

    B_main = (C - (es * (sigma * cos_t + theta * sin_t) - sigma)
              / safe_denom) / jnp.where(small_t, 1.0, theta2)
    # theta -> 0, sigma != 0:  B = (e^sigma(sigma^2/2 - sigma + 1) - 1)/sigma^3
    B_st = (es * (0.5 * sigma2 - sigma + 1.0) - 1.0) / jnp.where(small_s, 1.0, sigma2 * sigma)
    # theta,sigma -> 0: expand (e^s(s^2/2-s+1)-1)/s^3 = 1/6 + s/8 + O(s^2)
    B_both = jnp.asarray(1.0 / 6.0, dtype) + sigma / 8.0
    B = jnp.where(small_t, jnp.where(small_s, B_both, B_st), B_main)

    W = hat(w)
    return C * jnp.eye(3, dtype=dtype) + A * W + B * (W @ W)


class Sim3(NamedTuple):
    """Similarity transform ``x_out = s * R @ x + t`` as a minimal pytree.

    Stored as (R, t, s) rather than the Sophus (quaternion-with-scale, t)
    layout — separate fields vmap/shard cleanly and keep the rotation usable
    by the SE3 kernels without renormalization.
    """
    R: jax.Array   # [..., 3, 3] orthonormal
    t: jax.Array   # [..., 3]
    s: jax.Array   # [...] scalar scale

    @staticmethod
    def identity(dtype=jnp.float32):
        return Sim3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                    jnp.asarray(1.0, dtype))

    @staticmethod
    def exp(tau):
        """Tangent [upsilon(3), omega(3), sigma] -> Sim3."""
        v, w, sigma = tau[:3], tau[3:6], tau[6]
        return Sim3(so3_exp(w), _sim3_W(w, sigma) @ v, jnp.exp(sigma))

    def log(self):
        w = so3_log(self.R)
        sigma = jnp.log(self.s)
        v = jnp.linalg.solve(_sim3_W(w, sigma), self.t)
        return jnp.concatenate([v, w, sigma[None]])

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(self.R @ other.R,
                    self.s * jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
                    self.s * other.s)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        si = 1.0 / self.s
        return Sim3(Rt, -si * jnp.einsum("...ij,...j->...i", Rt, self.t), si)

    def apply(self, x):
        return self.s * jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def adjoint(self):
        """7x7 adjoint in [upsilon, omega, sigma] ordering (sim3.hpp Adj)."""
        A = jnp.zeros((7, 7), dtype=self.R.dtype)
        sR = self.s * self.R
        A = A.at[:3, :3].set(sR)
        A = A.at[:3, 3:6].set(hat(self.t) @ self.R)
        A = A.at[:3, 6].set(-self.t)
        A = A.at[3:6, 3:6].set(self.R)
        A = A.at[6, 6].set(1.0)
        return A

    def matrix(self):
        M = jnp.zeros(self.R.shape[:-2] + (4, 4), dtype=self.R.dtype)
        M = M.at[..., :3, :3].set(self.s * self.R)
        M = M.at[..., :3, 3].set(self.t)
        M = M.at[..., 3, 3].set(1.0)
        return M
