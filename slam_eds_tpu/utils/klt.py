"""Sparse point tracking: KLT, template matching, epipolar search.

Batched replacements for the reference's tracking toolbox in
``src/utils/Utils.{hpp,cpp}``:
* ``kltTracker``/``kltRefinement`` (Utils.cpp:735-832) — per-patch
  Lucas-Kanade normal equations; here inverse-compositional LK, fixed
  iterations, vmapped over points (also covers ``Tracker::trackPoints`` /
  ``trackPointsPyr``, src/tracking/Tracker.cpp:378-488).
* similarity measures NCC/ZNCC/SSD/NSSD/ZSSD/SAD/ZSAD (Utils.hpp:89,175-232).
* ``matchTemplate`` + ``searchAlongEpiline`` (Utils.cpp:857-1024) — masked
  discrete search of a patch template along an epipolar segment
  (also ``Tracker::trackPointsAlongEpiline``, Tracker.cpp:490-553).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .interp import bilinear


def _patch_grid(radius: int, dtype=jnp.float32):
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return dx.ravel(), dy.ravel()


def extract_patches(img, uv, radius: int):
    """Bilinear patches [N, (2r+1)^2] centered at uv [N, 2]."""
    dx, dy = _patch_grid(radius, uv.dtype)
    xs = uv[:, 0:1] + dx[None, :]
    ys = uv[:, 1:2] + dy[None, :]
    return bilinear(img, xs, ys)


# ---------------------------------------------------------------------------
# similarity measures (Utils.hpp:175-232); a, b: [..., K] patch vectors
# ---------------------------------------------------------------------------

def ssd(a, b):
    return jnp.sum((a - b) ** 2, axis=-1)


def nssd(a, b):
    return ssd(a, b) / jnp.maximum(jnp.sqrt(
        jnp.sum(a * a, -1) * jnp.sum(b * b, -1)), 1e-12)


def zssd(a, b):
    return ssd(a - a.mean(-1, keepdims=True), b - b.mean(-1, keepdims=True))


def sad(a, b):
    return jnp.sum(jnp.abs(a - b), axis=-1)


def zsad(a, b):
    return sad(a - a.mean(-1, keepdims=True), b - b.mean(-1, keepdims=True))


def ncc(a, b):
    num = jnp.sum(a * b, -1)
    den = jnp.sqrt(jnp.sum(a * a, -1) * jnp.sum(b * b, -1))
    return num / jnp.maximum(den, 1e-12)


def zncc(a, b):
    az = a - a.mean(-1, keepdims=True)
    bz = b - b.mean(-1, keepdims=True)
    return ncc(az, bz)


# ---------------------------------------------------------------------------
# KLT (inverse-compositional Lucas-Kanade)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius", "iterations"))
def klt_track(img_ref, img_new, uv0, uv_init=None, radius: int = 4,
              iterations: int = 10, min_det: float = 1e-6):
    """Track points uv0 from img_ref into img_new.

    Inverse-compositional LK: template gradients fixed from img_ref, per-
    iteration 2x2 normal-equation solve. Returns (uv_new [N,2], ok [N]).
    """
    dx, dy = _patch_grid(radius, uv0.dtype)
    xs0 = uv0[:, 0:1] + dx[None, :]
    ys0 = uv0[:, 1:2] + dy[None, :]
    T = bilinear(img_ref, xs0, ys0)                        # [N, K]
    eps = 0.5
    gx = (bilinear(img_ref, xs0 + eps, ys0)
          - bilinear(img_ref, xs0 - eps, ys0)) / (2 * eps)
    gy = (bilinear(img_ref, xs0, ys0 + eps)
          - bilinear(img_ref, xs0, ys0 - eps)) / (2 * eps)
    Gxx = jnp.sum(gx * gx, -1)
    Gxy = jnp.sum(gx * gy, -1)
    Gyy = jnp.sum(gy * gy, -1)
    det = Gxx * Gyy - Gxy * Gxy
    ok_grad = det > min_det

    uv = uv0 if uv_init is None else uv_init

    def body(_, uv):
        xs = uv[:, 0:1] + dx[None, :]
        ys = uv[:, 1:2] + dy[None, :]
        I = bilinear(img_new, xs, ys)
        e = I - T
        bx = jnp.sum(gx * e, -1)
        by = jnp.sum(gy * e, -1)
        inv_det = jnp.where(ok_grad, 1.0 / jnp.maximum(det, min_det), 0.0)
        du = (Gyy * bx - Gxy * by) * inv_det
        dv = (Gxx * by - Gxy * bx) * inv_det
        # inverse-compositional: subtract
        return uv - jnp.stack([du, dv], -1)

    uv = jax.lax.fori_loop(0, iterations, body, uv)
    H, W = img_new.shape
    inb = (uv[:, 0] > radius) & (uv[:, 0] < W - radius - 1) \
        & (uv[:, 1] > radius) & (uv[:, 1] < H - radius - 1)
    # residual check
    I = bilinear(img_new, uv[:, 0:1] + dx[None, :], uv[:, 1:2] + dy[None, :])
    res = jnp.mean(jnp.abs(I - T), -1)
    ok = ok_grad & inb & jnp.isfinite(res)
    return uv, ok, res


def klt_track_pyramid(pyr_ref, pyr_new, uv0, radius: int = 4,
                      iterations: int = 10):
    """Coarse-to-fine KLT over image pyramids (trackPointsPyr,
    Tracker.cpp:436-488). pyr_*: lists of [H, W] images, level 0 finest."""
    n_levels = len(pyr_ref)
    scale = 0.5 ** (n_levels - 1)
    uv = uv0 * scale
    guess = uv
    for lvl in range(n_levels - 1, -1, -1):
        s = 0.5 ** lvl
        uv_l = uv0 * s
        guess, ok, res = klt_track(pyr_ref[lvl], pyr_new[lvl], uv_l,
                                   uv_init=guess, radius=radius,
                                   iterations=iterations)
        if lvl > 0:
            guess = guess * 2.0
    return guess, ok, res


# ---------------------------------------------------------------------------
# epipolar template search
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius", "num_steps", "measure"))
def search_along_epiline(img_ref, img_new, uv0, line_dir, search_range,
                         radius: int = 3, num_steps: int = 32,
                         measure: str = "zncc", uv_tpl=None):
    """Discrete patch search along per-point epipolar directions
    (searchAlongEpiline, Utils.cpp:857-957).

    line_dir: [N, 2] unit directions; search_range: scalar half-range (px).
    uv_tpl: optional [N, 2] template centers in img_ref (defaults to uv0 —
    pass the KF pixel when the search center is the warped prediction).
    Returns (uv_best [N, 2], score [N]).
    """
    T = extract_patches(img_ref, uv0 if uv_tpl is None else uv_tpl, radius)
    steps = jnp.linspace(-search_range, search_range, num_steps,
                         dtype=uv0.dtype)
    cand = uv0[:, None, :] + steps[None, :, None] * line_dir[:, None, :]
    dx, dy = _patch_grid(radius, uv0.dtype)
    xs = cand[..., 0:1] + dx[None, None, :]
    ys = cand[..., 1:2] + dy[None, None, :]
    P = bilinear(img_new, xs, ys)                  # [N, S, K]
    if measure in ("zncc", "ncc"):
        fn = zncc if measure == "zncc" else ncc
        score = fn(jnp.broadcast_to(T[:, None, :], P.shape), P)
        best = jnp.argmax(score, axis=1)
        best_score = jnp.max(score, axis=1)
    else:
        fn = {"ssd": ssd, "zssd": zssd, "sad": sad, "zsad": zsad,
              "nssd": nssd}[measure]
        score = fn(jnp.broadcast_to(T[:, None, :], P.shape), P)
        best = jnp.argmin(score, axis=1)
        best_score = -jnp.min(score, axis=1)
    uv_best = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0, :]
    return uv_best, best_score


# ---------------------------------------------------------------------------
# 2-D template matching + epipolar geometry helpers
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius", "search_radius", "measure"))
def match_template(img_ref, img_new, uv0, radius: int = 3,
                   search_radius: int = 8, measure: str = "zncc"):
    """Dense window search of each point's patch in the new image
    (``eds::utils::matchTemplate``, reference src/utils/Utils.cpp:992-1024;
    used by the patch-template variant of KeyFrame::trackPoints,
    src/tracking/KeyFrame.cpp:980-1029).

    Returns (uv_best [N, 2], best_score [N]); score is similarity (higher
    better) for ncc/zncc and negated distance for the *sd/*ad measures.
    """
    T = extract_patches(img_ref, uv0, radius)
    r = jnp.arange(-search_radius, search_radius + 1, dtype=uv0.dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)           # [S, 2]
    cand = uv0[:, None, :] + offs[None, :, :]                # [N, S, 2]
    dx, dy = _patch_grid(radius, uv0.dtype)
    P = bilinear(img_new, cand[..., 0:1] + dx[None, None, :],
                 cand[..., 1:2] + dy[None, None, :])         # [N, S, K]
    Tb = jnp.broadcast_to(T[:, None, :], P.shape)
    if measure in ("zncc", "ncc"):
        score = (zncc if measure == "zncc" else ncc)(Tb, P)
        best = jnp.argmax(score, axis=1)
        best_score = jnp.max(score, axis=1)
    else:
        fn = {"ssd": ssd, "zssd": zssd, "sad": sad, "zsad": zsad,
              "nssd": nssd}[measure]
        score = fn(Tb, P)
        best = jnp.argmin(score, axis=1)
        best_score = -jnp.min(score, axis=1)
    uv_best = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0, :]
    return uv_best, best_score


def fundamental_from_pose(T_21, K):
    """F = K^-T [t]x R K^-1 for the relative pose T_21 (target<-ref) —
    the E/F construction the reference builds for its epipolar search
    (``Tracker::trackPointsAlongEpiline`` helpers, Tracker.cpp:555-587)."""
    t = T_21.t
    tx = jnp.asarray([[0.0, -t[2], t[1]],
                      [t[2], 0.0, -t[0]],
                      [-t[1], t[0], 0.0]], t.dtype)
    E = tx @ T_21.R
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


def epiline_directions(F, uv):
    """Per-point epipolar line directions in the target image for ref
    pixels uv [N, 2]: the line l = F [u, v, 1]^T has direction
    (b, -a)/|(a, b)| — feed into ``search_along_epiline``."""
    ones = jnp.ones_like(uv[:, :1])
    l = jnp.concatenate([uv, ones], -1) @ F.T            # [N, 3]
    d = jnp.stack([l[:, 1], -l[:, 0]], -1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
