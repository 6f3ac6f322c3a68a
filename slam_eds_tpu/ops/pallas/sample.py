"""Pallas TPU kernel: gather-free bilinear pattern sampling.

The BA linearization (reference src/tracking/Residuals.cpp:174-236) samples
every warped pattern tap from the target frames: P*F*K ~ 131k bilinear
(value, gx, gy) queries per GN iteration. TPU element gathers serialize (and
through the axon dispatch tunnel each executed gather query costs ~2.5 us —
rounds-5 audit), so like ``utils/interp.pattern_mm_sample`` this kernel
expresses the separable bilinear/central-difference stencil as one-hot-
weighted contractions:

    val[n] = wry[n, :] @ A @ wv[n, :]      (A = image plane [H, W])
    gx [n] = wry[n, :] @ A @ wg[n, :]      (wg = central-diff column hats)
    gy [n] = wgy[n, :] @ A @ wv[n, :]

The XLA formulation materializes the [N, W] / [N, H] hat-weight tensors and
[N, H] strip intermediates in HBM (~3.4 GB per iteration at the reference
operating point — measured traffic-bound at ~4 ms/iteration). Here the
weights are generated on the fly in VMEM from the tap coordinates, so HBM
sees only the coordinates and the three [N] outputs: per grid step
(frame f, tap block nb, row block hb) the kernel builds hat weights with
``broadcasted_iota`` (no int tensors), runs two MXU dots
[Nb, Wp] x [Wp, Hb] -> C1/C2 strips held in VMEM, reduces them against the
row hats, and accumulates into the outputs over the hb grid axis.

dots="f32" keeps full precision (MXU f32 ~4x slower than bf16 on v5e);
dots="bf16" casts the plane and hat weights to bfloat16 for the MXU with
f32 accumulation — 8-bit camera intensities are exactly representable in
bf16, the fractional hat weights round to ~2^-9, worst-case value error
~0.5 gray level (below photometric noise; the DSO Huber threshold is 9).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _hat(coord, idx):
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - coord))


def _sample_kernel(x_ref, y_ref, a_ref, val_ref, gx_ref, gy_ref,
                   *, dot_dtype):
    """Grid = (NF/Nb,); refs: x/y [1, Nb] (frame-major flat taps so a block
    never straddles frames), a [1, Hp, Wp] (the block's full padded frame,
    resident in VMEM), outputs [1, Nb]. One kernel step samples its whole
    tap block: hat weights are built once, the column contraction is one
    MXU dot per weight kind, the row reduction stays in VMEM."""
    x = x_ref[0, :]                      # [Nb]
    y = y_ref[0, :]
    A = a_ref[0]                         # [Hp, Wp]
    nb = x.shape[0]
    hp, wp = A.shape

    iw = jax.lax.broadcasted_iota(jnp.int32, (nb, wp), 1).astype(jnp.float32)
    xw = x[:, None]
    wv = _hat(xw, iw)                                   # [Nb, Wp]
    wg = 0.5 * (_hat(xw + 1.0, iw) - _hat(xw - 1.0, iw))

    At = A.T.astype(dot_dtype)                          # [Wp, Hp]
    C1 = jax.lax.dot(wv.astype(dot_dtype), At,
                     preferred_element_type=jnp.float32)  # [Nb, Hp]
    C2 = jax.lax.dot(wg.astype(dot_dtype), At,
                     preferred_element_type=jnp.float32)

    ih = jax.lax.broadcasted_iota(jnp.int32, (nb, hp), 1).astype(jnp.float32)
    yl = y[:, None]
    wry = _hat(yl, ih)                                  # [Nb, Hp]
    wgy = 0.5 * (_hat(yl + 1.0, ih) - _hat(yl - 1.0, ih))

    val_ref[0, :] = jnp.sum(C1 * wry, axis=-1)
    gx_ref[0, :] = jnp.sum(C2 * wry, axis=-1)
    gy_ref[0, :] = jnp.sum(C1 * wgy, axis=-1)


@functools.partial(jax.jit, static_argnames=("dots", "interpret"))
def pattern_pallas_sample(planes, u, v, dots: str = "f32",
                          interpret: bool = False):
    """Bilinear (value, gx, gy) pattern sampling — Pallas TPU kernel.

    Same contract as ``utils/interp.pattern_mm_sample``: planes [F, H, W]
    float32 intensity; u, v [P, F, K] tap pixel coords. Returns
    (I, gx, gy, ok), each [P, F, K]; values for taps with ok=False are
    garbage (the caller masks).
    """
    F, H, W = planes.shape
    P, _, K = u.shape
    N = P * K
    f32 = jnp.float32
    dot_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dots]

    uc = jnp.clip(jnp.nan_to_num(u, nan=-8.0), -8.0, W + 8.0)
    vc = jnp.clip(jnp.nan_to_num(v, nan=-8.0), -8.0, H + 8.0)
    ok = (uc >= 1.0) & (uc < W - 2.0) & (vc >= 1.0) & (vc < H - 2.0)

    nb = min(512, _round_up(N, 128))
    npad = _round_up(N, nb)               # per-frame tap count, padded
    wp = _round_up(W, 128)
    hpad = _round_up(H, 8)
    blocks_per_frame = npad // nb

    # frame-major flat layout [1, F*npad]: a tap block always lies within
    # one frame, whose plane the index map selects from the block id
    tofn = lambda a: jnp.moveaxis(a, 1, 0).reshape(F, N).astype(f32)
    # out-of-range pad coords hit no hat support -> contribute zeros
    xs = jnp.pad(tofn(uc), ((0, 0), (0, npad - N)),
                 constant_values=-1e6).reshape(1, F * npad)
    ys = jnp.pad(tofn(vc), ((0, 0), (0, npad - N)),
                 constant_values=-1e6).reshape(1, F * npad)
    ap = jnp.pad(planes.astype(f32),
                 ((0, 0), (0, hpad - H), (0, wp - W)))

    grid = (F * blocks_per_frame,)
    out_shape = [jax.ShapeDtypeStruct((1, F * npad), f32)] * 3
    tap_spec = pl.BlockSpec((1, nb), lambda n: (0, n),
                            memory_space=pltpu.VMEM)
    val, gx, gy = pl.pallas_call(
        functools.partial(_sample_kernel, dot_dtype=dot_dtype),
        out_shape=out_shape,
        grid=grid,
        in_specs=[tap_spec, tap_spec,
                  pl.BlockSpec((1, hpad, wp),
                               lambda n: (n // blocks_per_frame, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[tap_spec] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * F * npad * hpad * wp,
            bytes_accessed=4 * (2 * F * npad + F * hpad * wp
                                + 3 * F * npad),
            transcendentals=0),
        interpret=interpret,
    )(xs, ys, ap)

    back = lambda a: jnp.moveaxis(a[0].reshape(F, npad)[:, :N]
                                  .reshape(F, P, K), 0, 1)
    return back(val), back(gx), back(gy), ok
