"""EventFrame — an accumulated brightness-increment frame with metadata.

Container over the rasterization kernels in ``utils.events``; mirrors
``eds::tracking::EventFrame`` (reference src/tracking/EventFrame.{hpp,cpp}):
per-event undistortion via forward-map lookup, bilinear polarity scatter with
time weights, Gaussian smoothing, morphological levels, Frobenius
normalization, median-event timestamp, packet delta-time and the frame pose.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import events as ev
from ..utils.lie import SE3


class EventFrame(NamedTuple):
    frames: jax.Array      # [L, H, W] normalized event frames
    norms: jax.Array       # [L] Frobenius norms before normalization
    time: jax.Array        # median event timestamp
    first_time: jax.Array
    last_time: jax.Array
    delta_time: jax.Array
    n_events: jax.Array
    T_w_ef_R: jax.Array
    T_w_ef_t: jax.Array

    @property
    def pose(self) -> SE3:
        return SE3(self.T_w_ef_R, self.T_w_ef_t)


def create_event_frame(xs, ys, ts, polarities, n_valid, height: int,
                       width: int, num_levels: int = 1,
                       fwd_maps=None, use_time_weights: bool = True,
                       blur_sigma: float = 0.5, blur_ksize: int = 3,
                       interpolation: str = "bilinear",
                       T_w_ef: Optional[SE3] = None) -> EventFrame:
    """Build an EventFrame from a fixed-capacity packet (EventFrame::create,
    EventFrame.cpp:302-389). Arrays are capacity-padded; n_valid marks the
    live prefix. fwd_maps: optional (fwd_x, fwd_y) undistortion tables."""
    if fwd_maps is not None:
        xs, ys = ev.undistort_events(xs, ys, fwd_maps[0], fwd_maps[1])
    frames, norms = ev.build_event_frame(
        xs, ys, polarities, n_valid, height, width, num_levels=num_levels,
        use_time_weights=use_time_weights, blur_sigma=blur_sigma,
        blur_ksize=blur_ksize, interpolation=interpolation)
    cap = ts.shape[0]
    first = ts[0]
    last = ts[jnp.maximum(n_valid - 1, 0)]
    if T_w_ef is None:
        T_w_ef = SE3.identity(frames.dtype)
    return EventFrame(
        frames=frames, norms=norms,
        time=ev.median_event_time(ts, n_valid),
        first_time=first, last_time=last, delta_time=last - first,
        n_events=jnp.asarray(n_valid),
        T_w_ef_R=T_w_ef.R, T_w_ef_t=T_w_ef.t)
