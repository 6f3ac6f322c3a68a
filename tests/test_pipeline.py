"""Integration: the frame-only DSO slice (BASELINE config 1) on a synthetic
sequence — bootstrap, track, keyframe, BA, marginalize — with an ATE bound,
and the EDS event loop smoke test (config 2/3 slice)."""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_eds_tpu.config import EDSConfig, load_config
from slam_eds_tpu.io.dataset import SyntheticSequence
from slam_eds_tpu.models.pipeline import FrameOnlyPipeline, EDSPipeline
from slam_eds_tpu.utils.alignment import ate_rmse
from slam_eds_tpu.utils.cameras import Pinhole

W, H = 128, 96
CAM = Pinhole(jnp.float32(110.0), jnp.float32(110.0), jnp.float32(W / 2 - 0.5),
              jnp.float32(H / 2 - 0.5), W, H)


def small_config():
    return load_config({
        "caps": {"max_points_per_kf": 512, "max_immature_per_kf": 512,
                 "max_window_frames": 6, "max_events": 8192},
        "bundles": {"window_size": 4, "min_frames": 3},
        "coarse": {"pyr_levels": 4, "max_iterations": [10, 20, 30, 30]},
        "selector": {"desired_immature_density": 400.0,
                     "desired_point_density": 300.0},
        "event_frame": {"num_levels": 2, "events_per_frame": 8192},
        "tracker": {"max_iterations": [15, 10]},
    })


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(CAM, num_frames=14, events_per_packet=8192,
                             motion_scale=0.35)


def test_frame_only_pipeline_ate(seq):
    pipe = FrameOnlyPipeline(CAM, small_config())
    for k in range(seq.num_frames):
        t, img, _ = seq.frame(k)
        pipe.process_frame(img, t)
    assert pipe._initialized, "bootstrap failed"
    est = pipe.positions()
    gt = seq.gt_positions()[: len(est)]
    assert len(est) == seq.num_frames
    err = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
    # scene scale ~2m, motion ~0.3; demand cm-level after Umeyama alignment
    assert err < 0.05, err
    # telemetry recorded BA runs
    assert pipe.telemetry.counters["ba_runs"] >= 1


def test_eds_pipeline_smoke(seq):
    cfg = small_config()
    pipe = EDSPipeline(CAM, cfg)
    poses = []
    for k in range(8):
        t, img, _ = seq.frame(k)
        pipe.process_frame(img, t)
        if k >= 1 and pipe.kf is not None:
            packet = seq.events_between(k - 1, k)
            T = pipe.process_events(packet)
            if T is not None:
                poses.append(np.asarray(T.t))
    assert pipe.frame_pipe._initialized
    assert len(poses) >= 3
    assert np.isfinite(np.stack(poses)).all()
    assert pipe.telemetry.counters["event_solves"] >= 3


def test_eds_pipeline_full_loop(seq):
    """The complete EDS cycle (SURVEY §3.1/§3.2): event solves between
    frames, keyframe promotion from the flow/point-loss criteria (consumed
    at the next frame), depth seeded forward; event trajectory accurate."""
    cfg = load_config({
        "caps": {"max_points_per_kf": 512, "max_immature_per_kf": 512,
                 "max_window_frames": 6, "max_events": 8192},
        "bundles": {"window_size": 4, "min_frames": 3},
        "coarse": {"pyr_levels": 4, "max_iterations": [10, 20, 30, 30]},
        "selector": {"desired_immature_density": 400.0,
                     "desired_point_density": 300.0},
        "event_frame": {"num_levels": 2, "events_per_frame": 8192},
        # low flow threshold so the promotion path actually runs here
        "tracker": {"max_iterations": [15, 10], "kf_flow_threshold": 1.0},
    })
    pipe = EDSPipeline(CAM, cfg)
    ev_pos, ev_gt = [], []
    for k in range(seq.num_frames):
        t, img, _ = seq.frame(k)
        pipe.process_frame(img, t)
        if k + 1 < seq.num_frames and pipe.kf is not None:
            packet = seq.events_between(k, k + 1)
            T = pipe.process_events(packet)
            if T is not None:
                ev_pos.append(np.asarray(T.inverse().t))
                # packet timestamp ~ median event time ~ midpoint
                ev_gt.append(np.asarray(
                    seq.pose_at(k + 0.5).inverse().t))
    assert pipe.num_event_kfs >= 2, \
        f"keyframe promotion never fired ({pipe.num_event_kfs} KFs)"
    assert len(ev_pos) >= 6
    err = float(ate_rmse(jnp.asarray(np.stack(ev_pos)),
                         jnp.asarray(np.stack(ev_gt))))
    assert err < 0.12, err
