"""Keyframe-decision and frame-marginalization policy knobs
(setting_maxShiftWeight*/kfGlobalWeight, settings.cpp:38-42;
setting_minFrameAge/minPointsRemaining/maxLogAffFacInWindow, :74-80)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.config import load_config
from slam_eds_tpu.models.window import WindowManager
from slam_eds_tpu.ops.coarse_tracker import TrackResult
from slam_eds_tpu.utils.cameras import Pinhole
from slam_eds_tpu.utils.lie import SE3

W, H = 64, 48
CAM = Pinhole(jnp.float32(50.0), jnp.float32(50.0), jnp.float32(W / 2 - 0.5),
              jnp.float32(H / 2 - 0.5), W, H)


def _cfg(**bundles):
    return load_config({
        "caps": {"max_points_per_kf": 128, "max_immature_per_kf": 128,
                 "max_window_frames": 5},
        "bundles": {"window_size": 3, "min_frames": 2, **bundles},
        "coarse": {"pyr_levels": 3, "max_iterations": [5, 5, 5]},
        "selector": {"desired_immature_density": 100.0,
                     "desired_point_density": 80.0},
    })


def _track_result(shift_t, shift_rt, a=0.0):
    return TrackResult(
        pose=SE3.identity(), aff=jnp.asarray([a, 0.0], jnp.float32),
        ok=jnp.asarray(True),
        residuals=jnp.zeros(3, jnp.float32),
        flow_indicators=jnp.asarray([shift_t, 0.0, shift_rt], jnp.float32))


def test_kf_decision_weights_and_global_scale():
    wm = WindowManager(CAM, _cfg())
    # zero motion, zero affine change: no keyframe
    assert not wm.need_new_kf(_track_result(0.0, 0.0))
    # large translation flow trips the wT term
    assert wm.need_new_kf(_track_result(1e4, 0.0))
    # kf_global_weight scales the whole score (reference: the larger, the
    # more keyframes): a borderline score flips with the weight
    border = _track_result(150.0, 0.0)
    took_default = wm.need_new_kf(border)
    wm_hi = WindowManager(CAM, _cfg(kf_global_weight=50.0))
    wm_lo = WindowManager(CAM, _cfg(kf_global_weight=1e-3))
    assert wm_hi.need_new_kf(border)
    assert not wm_lo.need_new_kf(border)
    # affine term alone can demand a keyframe (max_affine_weight)
    assert wm.need_new_kf(_track_result(0.0, 0.0, a=0.6))
    assert not wm.need_new_kf(_track_result(0.0, 0.0, a=0.1))
    del took_default


def _window_with_frames(cfg, n_frames, affs=None):
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[0:H, 0:W]
    wm = WindowManager(CAM, cfg)
    for k in range(n_frames):
        img = (np.sin(xs * 0.3 + k) * np.cos(ys * 0.2) * 60
               + 120 + rng.normal(0, 2, (H, W))).astype(np.float32)
        T = SE3.exp(jnp.asarray([0.02 * k, 0, 0, 0, 0, 0], jnp.float32))
        aff = (0.0, 0.0) if affs is None else affs[k]
        wm.insert_frame(img, T, time=float(k), aff=aff, is_first=(k == 0))
    return wm


def test_marginalization_prefers_diverged_affine_frame():
    """A frame whose brightness factor vs the newest exceeds
    max_log_aff_fac_in_window is flagged weak and marginalized first —
    but only when every frame still has point support (otherwise the
    min_points_remaining rule fires for all of them)."""
    from slam_eds_tpu.models import ba_state as bs

    cfg = _cfg(max_log_aff_fac_in_window=0.7)
    affs = [(0.0, 0.0), (2.0, 0.0), (0.0, 0.0), (0.0, 0.0)]
    wm = _window_with_frames(cfg, 4, affs)

    # fabricate healthy point support on every frame
    P = cfg.caps.max_points_per_kf
    F = cfg.caps.max_window_frames
    hosts = np.arange(P) % 4
    wm.state = wm.state._replace(
        p_status=jnp.full((P,), bs.PT_ACTIVE, jnp.int32),
        p_host=jnp.asarray(hosts, jnp.int32))

    class FakeLin:
        valid = jnp.asarray(np.ones((P, F), bool))
        oob = jnp.asarray(np.zeros((P, F), bool))

    slot = wm.flag_and_marginalize(FakeLin())
    # frame 1 (aff a=2.0 vs newest 0.0 -> |log fac| = 2.0 > 0.7) dies first
    assert slot == 1


def test_min_frame_age_protects_young_frames():
    """With a huge min_frame_age every candidate is filtered; the fallback
    still marginalizes the single oldest frame (window must shrink)."""
    cfg = _cfg(min_frame_age=100)
    wm = _window_with_frames(cfg, 4)

    class FakeLin:
        valid = jnp.asarray(np.zeros((cfg.caps.max_points_per_kf,
                                      cfg.caps.max_window_frames), bool))
        oob = jnp.asarray(np.zeros((cfg.caps.max_points_per_kf,
                                    cfg.caps.max_window_frames), bool))

    slot = wm.flag_and_marginalize(FakeLin())
    assert slot is not None
    assert wm.frame_ids[slot] == -1    # slot freed
