"""Pallas TPU kernel: event rasterization as an MXU matmul-scatter.

TPU-native replacement for the hot bilinear scatter-add of
``eds::utils::drawValuesPoints`` (reference src/utils/Utils.cpp:50-123) that
feeds EventFrame creation (src/tracking/EventFrame.cpp:159-292) at packet
rate (~100 Hz).

Scatter on TPU serializes; instead the bilinear splat factorizes per event e
into an outer product of one-hot row/column weight vectors:

    frame[h, w] = sum_e v_e * ry_e[h] * cx_e[w]
    ry_e[h] = (1-fy)*[h == y0] + fy*[h == y1]
    cx_e[w] = (1-fx)*[w == x0] + fx*[w == x1]

so a chunk of N events contributes ``R^T @ C`` with R = v*ry [N, H] and
C = cx [N, W] — one [H, N] x [N, W] matmul on the MXU per chunk, accumulated
in a VMEM-resident output. Out-of-image taps match no one-hot row and drop
out exactly like the reference's per-tap bounds checks (Utils.cpp:92-106).
Summation order is fully deterministic (fixed chunk order + matmul), unlike
atomic scatters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _raster_kernel(xs_ref, ys_ref, val_ref, out_ref):
    """Grid step = one event chunk; out_ref is the full padded frame."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xs = xs_ref[0, 0, :]         # [N]
    ys = ys_ref[0, 0, :]
    v = val_ref[0, 0, :]
    n = xs.shape[0]
    hp, wp = out_ref.shape

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[:, None]
    fy = (ys - y0)[:, None]
    ix0 = x0.astype(jnp.int32)[:, None]
    iy0 = y0.astype(jnp.int32)[:, None]

    col_h = jax.lax.broadcasted_iota(jnp.int32, (n, hp), 1)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (n, wp), 1)
    ry = (jnp.where(col_h == iy0, 1.0 - fy, 0.0)
          + jnp.where(col_h == iy0 + 1, fy, 0.0))
    cx = (jnp.where(col_w == ix0, 1.0 - fx, 0.0)
          + jnp.where(col_w == ix0 + 1, fx, 0.0))
    rv = ry * v[:, None]

    out_ref[:] += jax.lax.dot_general(
        rv, cx, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk",
                                             "interpret"))
def rasterize_bilinear(xs, ys, values, height: int, width: int,
                       chunk: int = 512, interpret: bool = False):
    """Bilinear scatter-add of ``values`` at float coords into [H, W].

    Taps falling outside the image are dropped (reference semantics).
    ``values`` must already carry polarity/time/validity weighting (invalid
    events: value 0 or coords far out of range).
    """
    e = xs.shape[0]
    nc = max(1, -(-e // chunk))
    pad = nc * chunk - e
    f32 = jnp.float32
    xs = jnp.pad(xs.astype(f32), (0, pad),
                 constant_values=-1e6).reshape(nc, 1, chunk)
    ys = jnp.pad(ys.astype(f32), (0, pad),
                 constant_values=-1e6).reshape(nc, 1, chunk)
    values = jnp.pad(values.astype(f32), (0, pad)).reshape(nc, 1, chunk)

    hp = _round_up(height, 128)
    wp = _round_up(width, 128)

    out = pl.pallas_call(
        _raster_kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), f32),
        grid=(nc,),
        in_specs=[pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((hp, wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * chunk * hp * wp,
            bytes_accessed=4 * (3 * nc * chunk + hp * wp),
            transcendentals=0),
        interpret=interpret,
    )(xs, ys, values)
    return out[:height, :width]
