"""Trajectory alignment and error metrics (Umeyama, ATE, RPE).

Replaces the reference's evaluation utilities:
* ``eds::utils::Alignment<T, N>`` — Umeyama similarity alignment of an
  estimated trajectory to ground truth (src/utils/Utils.hpp:50-87, which wraps
  Eigen::umeyama).
* ATE-RMSE / RPE are the benchmark metrics named in BASELINE.json.
"""
from __future__ import annotations

import jax.numpy as jnp

from .lie import SE3


def umeyama(src, dst, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst.

    src, dst: [N, 3] point sets. Returns (s, R, t) with dst ≈ s * R @ src + t.
    Closed form per Umeyama 1991 (same algorithm as Eigen::umeyama used by the
    reference's Alignment helper).
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    n = src.shape[0]
    cov = (xd.T @ xs) / n
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.mean(jnp.sum(xs ** 2, axis=1))
    s = jnp.where(with_scale,
                  jnp.sum(D * jnp.diagonal(S)) / jnp.maximum(var_s, 1e-12),
                  jnp.asarray(1.0, src.dtype))
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_xyz, gt_xyz, align: bool = True, with_scale: bool = True):
    """Absolute trajectory error RMSE after (optional) Umeyama alignment."""
    if align:
        s, R, t = umeyama(est_xyz, gt_xyz, with_scale)
        est_xyz = s * est_xyz @ R.T + t
    err = est_xyz - gt_xyz
    return jnp.sqrt(jnp.mean(jnp.sum(err ** 2, axis=1)))


def rpe(est_poses: SE3, gt_poses: SE3, delta: int = 1):
    """Relative pose error over a frame gap ``delta``.

    est_poses/gt_poses: batched SE3 with leading axis N (world_T_cam).
    Returns (trans_rmse, rot_rmse_rad).
    """
    def rel(poses):
        a = SE3(poses.R[:-delta], poses.t[:-delta])
        b = SE3(poses.R[delta:], poses.t[delta:])
        return a.inverse().compose(b)

    d_est = rel(est_poses)
    d_gt = rel(gt_poses)
    err = d_gt.inverse().compose(d_est)
    t_err = jnp.sqrt(jnp.mean(jnp.sum(err.t ** 2, axis=-1)))
    cos_r = jnp.clip((jnp.trace(err.R, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0)
    r_err = jnp.sqrt(jnp.mean(jnp.arccos(cos_r) ** 2))
    return t_err, r_err
