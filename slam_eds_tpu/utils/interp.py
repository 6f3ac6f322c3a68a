"""Batched image sampling: bilinear and bicubic (Catmull-Rom) interpolation.

Replaces the reference's samplers:
* ``getInterpolatedElement33`` / ``getInterpolatedElement31`` etc.
  (src/utils/globalFuncs.h) — bilinear taps on [I, dx, dy] images, the
  workhorse of the DSO residual loop (src/tracking/Residuals.cpp:184).
* ``ceres::BiCubicInterpolator<Grid2D>`` over the event frame
  (src/tracking/PhotometricError.hpp:109-112,170-173) — cubic convolution
  with Keys a=-0.5 coefficients and edge clamping; analytic derivatives come
  for free here via JAX autodiff, and ``bicubic_with_grad`` returns them in
  closed form for the hand-written Jacobian path.

All samplers take images [H, W] (or [H, W, C]) and query points as separate
x (column) / y (row) arrays of any batch shape; everything is gather-based and
vmap/jit friendly. Out-of-bounds queries clamp to the edge (matching
ceres::Grid2D's behavior); validity masking is the caller's job.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather2d(img, iy, ix):
    """img [H, W, ...], integer index arrays broadcastable to a common shape."""
    H, W = img.shape[0], img.shape[1]
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    return img[iy, ix]


def bilinear(img, x, y):
    """Bilinear sample of img [H, W] (or [H, W, C]) at (x=col, y=row).

    Matches ``getInterpolatedElement`` (reference src/utils/globalFuncs.h):
    floor-based with fractional weights.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    if img.ndim == 3:
        dx = dx[..., None]
        dy = dy[..., None]
    w00 = (1 - dx) * (1 - dy)
    w01 = dx * (1 - dy)
    w10 = (1 - dx) * dy
    w11 = dx * dy
    return (w00 * _gather2d(img, iy0, ix0)
            + w01 * _gather2d(img, iy0, ix0 + 1)
            + w10 * _gather2d(img, iy0 + 1, ix0)
            + w11 * _gather2d(img, iy0 + 1, ix0 + 1))


def bilinear_3(img3, x, y):
    """Bilinear sample of a 3-channel [H, W, 3] image ([I, gx, gy] stacks) —
    the ``getInterpolatedElement33`` equivalent."""
    return bilinear(img3, x, y)


def _cubic_weights(t):
    """Keys cubic-convolution weights, a = -0.5 (Catmull-Rom) — identical to
    the kernel ceres::BiCubicInterpolator uses. Returns 4 weights for taps at
    offsets [-1, 0, 1, 2] given fractional position t in [0,1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


def _cubic_weights_d(t):
    """d/dt of the Keys weights (for analytic image-gradient sampling)."""
    t2 = t * t
    d0 = -1.5 * t2 + 2.0 * t - 0.5
    d1 = 4.5 * t2 - 5.0 * t
    d2 = -4.5 * t2 + 4.0 * t + 0.5
    d3 = 1.5 * t2 - t
    return d0, d1, d2, d3


def bicubic(img, x, y):
    """Bicubic (Catmull-Rom) sample of img [H, W] at (x=col, y=row)."""
    v, _, _ = bicubic_with_grad(img, x, y)
    return v


def bicubic_with_grad(img, x, y):
    """Bicubic sample + analytic spatial gradient (d/dx, d/dy).

    Mirrors ``BiCubicInterpolator::Evaluate(row, col, &f, &dfdr, &dfdc)``.
    Separable: 4 row interpolations then 1 column interpolation; gradients use
    the derivative weights. 16 gathers per query point.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)

    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)
    dwx = _cubic_weights_d(tx)
    dwy = _cubic_weights_d(ty)

    rows = []
    for j, off_y in enumerate((-1, 0, 1, 2)):
        taps = [_gather2d(img, iy + off_y, ix + off_x) for off_x in (-1, 0, 1, 2)]
        rows.append(taps)

    # interpolate along x within each row (value and d/dx)
    row_v = [sum(wx[i] * rows[j][i] for i in range(4)) for j in range(4)]
    row_dx = [sum(dwx[i] * rows[j][i] for i in range(4)) for j in range(4)]

    f = sum(wy[j] * row_v[j] for j in range(4))
    dfdx = sum(wy[j] * row_dx[j] for j in range(4))
    dfdy = sum(dwy[j] * row_v[j] for j in range(4))
    return f, dfdx, dfdy


def pattern_tile_sample(planes, u, v):
    """Bilinear (value, gx, gy) sampling of warped taps via per-tap 4x4
    patch fetches — the TPU-fast path of the BA residual loop.

    XLA's element gather on TPU costs ~10 cycles per gathered element; the
    DSO residual linearization (reference src/tracking/Residuals.cpp:174-236)
    needs P*F*K taps x 4 bilinear corners x 3 channels, which measures
    ~5.7 ms at the reference operating point (2048 pts x 8 frames x
    8-pattern, v5e). Block gathers are ~200x cheaper per query: we fetch one
    4x4 intensity patch per tap with a vmapped ``lax.dynamic_slice`` (one
    block-gather query per tap instead of 12 element queries) and evaluate
    value + central-difference gradients from the patch with static
    indexing (pure VPU, ~0.2 ms total).

    The gradients equal bilinear sampling of the precomputed central-
    difference planes of ``image.build_pyramid`` exactly for taps >= 1 px
    inside the image (the caller's OOB guards already enforce that; ``ok``
    re-checks it here).

    planes: [F, H, W] intensity. u, v: [P, F, K] tap pixel coords.
    Returns (I, gx, gy, ok), each [P, F, K].
    """
    F, H, W = planes.shape
    dtype = planes.dtype

    uc = jnp.clip(jnp.nan_to_num(u, nan=-8.0), -8.0, W + 8.0)
    vc = jnp.clip(jnp.nan_to_num(v, nan=-8.0), -8.0, H + 8.0)
    x0 = jnp.floor(uc).astype(jnp.int32)
    y0 = jnp.floor(vc).astype(jnp.int32)
    ok = (uc >= 1.0) & (uc < W - 2.0) & (vc >= 1.0) & (vc < H - 2.0)
    # patch origin (x0-1, y0-1); clamped so the slice stays in bounds (the
    # values of clamped taps are garbage and masked by ok)
    ox = jnp.clip(x0 - 1, 0, W - 4)
    oy = jnp.clip(y0 - 1, 0, H - 4)

    def per_frame(plane, oyf, oxf):          # [H, W], [P*K], [P*K]
        def per_tap(yy, xx):
            return jax.lax.dynamic_slice(plane, (yy, xx), (4, 4))
        return jax.vmap(per_tap)(oyf, oxf)

    P, _, K = u.shape
    oyt = jnp.moveaxis(oy, 1, 0).reshape(F, P * K)
    oxt = jnp.moveaxis(ox, 1, 0).reshape(F, P * K)
    patch = jax.vmap(per_frame)(planes, oyt, oxt)       # [F, P*K, 4, 4]
    patch = jnp.moveaxis(patch.reshape(F, P, K, 4, 4), 0, 1)  # [P, F, K, 4, 4]

    fxp = uc - x0.astype(dtype)
    fyp = vc - y0.astype(dtype)
    w00 = (1 - fxp) * (1 - fyp)
    w01 = fxp * (1 - fyp)
    w10 = (1 - fxp) * fyp
    w11 = fxp * fyp

    def blend(a00, a01, a10, a11):
        return w00 * a00 + w01 * a01 + w10 * a10 + w11 * a11

    p = patch   # p[..., row, col]; the bilinear corners are rows/cols 1..2
    val = blend(p[..., 1, 1], p[..., 1, 2], p[..., 2, 1], p[..., 2, 2])
    gx = 0.5 * blend(p[..., 1, 2] - p[..., 1, 0], p[..., 1, 3] - p[..., 1, 1],
                     p[..., 2, 2] - p[..., 2, 0], p[..., 2, 3] - p[..., 2, 1])
    gy = 0.5 * blend(p[..., 2, 1] - p[..., 0, 1], p[..., 2, 2] - p[..., 0, 2],
                     p[..., 3, 1] - p[..., 1, 1], p[..., 3, 2] - p[..., 1, 2])
    return val, gx, gy, ok
