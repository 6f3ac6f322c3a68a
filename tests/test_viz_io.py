"""Tests for viz colormaps, pointcloud/trajectory export, checkpointing,
and dual-camera calibration."""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_eds_tpu.utils import viz
from slam_eds_tpu.utils.lie import SE3
from slam_eds_tpu.utils.calib import (
    read_dual_calibration, common_view_camera, dual_mappings, to_dso_format,
    PhotometricCalib, read_camera_calib)
from slam_eds_tpu.io import output_maps
from slam_eds_tpu.models import ba_state as bs
from slam_eds_tpu import checkpoint


# ---------------------------------------------------------------- viz


def test_colormap_endpoints():
    assert viz.BLUE_WHITE_RED.shape == (256, 3)
    assert tuple(viz.BLUE_WHITE_RED[0]) == (0, 0, 255)      # strong negative
    assert tuple(viz.BLUE_WHITE_RED[-1]) == (255, 0, 0)     # strong positive
    mid = viz.BLUE_WHITE_RED[128]
    assert (mid > 200).all()                                 # ~white at zero


def test_event_frame_viz_polarity():
    ef = np.zeros((8, 8), np.float32)
    ef[2, 2] = 1.0
    ef[5, 5] = -1.0
    img = viz.event_frame_viz(ef)
    assert img.shape == (8, 8, 3)
    assert img[2, 2, 0] > img[2, 2, 2]     # positive -> red-ish
    assert img[5, 5, 2] > img[5, 5, 0]     # negative -> blue-ish


def test_idepth_and_residual_viz_shapes(rng):
    img = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    uv = np.stack([rng.uniform(0, 19, 10), rng.uniform(0, 15, 10)], -1)
    out = viz.idepth_map_viz(img, uv, rng.uniform(0.2, 2.0, 10))
    assert out.shape == (16, 20, 3) and out.dtype == np.uint8
    out = viz.residuals_viz(img, uv, rng.normal(size=10))
    assert out.shape == (16, 20, 3)
    out = viz.weights_viz(img, uv, rng.uniform(0, 1, 10))
    assert out.shape == (16, 20, 3)
    out = viz.events_on_keyframe_viz(img, rng.normal(size=(16, 20)) * 0.1)
    assert out.shape == (16, 20, 3)


# ---------------------------------------------------------- output maps


def _tiny_state():
    state = bs.empty_state(3, 8, jnp.asarray([40.0, 40.0, 15.5, 11.5],
                                             jnp.float32))
    return state._replace(
        frame_valid=jnp.ones(3, bool),
        p_uv=jnp.asarray(np.tile([[10.0, 8.0]], (8, 1)), jnp.float32),
        p_idepth=jnp.full((8,), 0.5, jnp.float32),
        p_status=jnp.full((8,), bs.PT_ACTIVE, jnp.int32),
    )


def test_pointcloud_export_geometry(tmp_path):
    state = _tiny_state()
    cloud = output_maps.get_map(state, color_mode="depth")
    assert cloud.valid.all()
    # idepth 0.5 at principal-ish pixel -> z = 2 in cam = world (identity)
    np.testing.assert_allclose(cloud.xyz[:, 2], 2.0, atol=1e-5)
    n = output_maps.write_ply(str(tmp_path / "map.ply"), cloud)
    assert n == 8
    assert (tmp_path / "map.ply").read_text().startswith("ply")


def test_trajectory_tum_roundtrip(tmp_path):
    taus = np.random.default_rng(0).uniform(-0.1, 0.1, (4, 6)).astype(np.float32)
    import jax
    poses = jax.vmap(SE3.exp)(jnp.asarray(taus))
    path = str(tmp_path / "traj.txt")
    n = output_maps.write_trajectory_tum(path, np.arange(4.0), poses)
    assert n == 4
    rows = np.loadtxt(path)
    assert rows.shape == (4, 8)
    # camToWorld translation of row 0
    R0 = np.asarray(poses.R[0]); t0 = np.asarray(poses.t[0])
    np.testing.assert_allclose(rows[0, 1:4], -R0.T @ t0, atol=1e-5)
    # unit quaternions
    np.testing.assert_allclose(np.linalg.norm(rows[:, 4:8], axis=1), 1.0,
                               atol=1e-5)


# ---------------------------------------------------------- checkpoint


def test_checkpoint_roundtrip_npz(tmp_path):
    state = _tiny_state()
    tree = {"ba": state, "step": jnp.asarray(7)}
    loc = checkpoint.save(str(tmp_path / "ck"), tree,
                          metadata={"frame": 7}, use_orbax=False)
    restored = checkpoint.restore(loc, tree, use_orbax=False)
    np.testing.assert_array_equal(np.asarray(restored["ba"].p_uv),
                                  np.asarray(state.p_uv))
    np.testing.assert_array_equal(np.asarray(restored["ba"].frame_valid),
                                  np.asarray(state.frame_valid))
    assert int(restored["step"]) == 7
    assert checkpoint.load_metadata(loc)["frame"] == 7


# ---------------------------------------------------------- calib


DUAL_YAML = {
    "cam0": {"resolution": [640, 480], "distortion_model": "radial-tangential",
             "intrinsics": [400.0, 402.0, 320.0, 240.0],
             "distortion_coeffs": [-0.1, 0.01, 0.0, 0.0]},
    "cam1": {"resolution": [320, 240], "distortion_model": "radial-tangential",
             "intrinsics": [200.0, 201.0, 160.0, 120.0],
             "distortion_coeffs": [-0.05, 0.005, 0.0, 0.0],
             "T_cn_cnm1": [[1, 0, 0, 0.01], [0, 1, 0, 0], [0, 0, 1, 0],
                           [0, 0, 0, 1]]},
}


def test_read_dual_and_common_view():
    dual = read_dual_calibration(DUAL_YAML)
    assert dual.cam0.width == 640 and dual.cam1.width == 320
    assert dual.T_cam0_cam1[0][3] == 0.01
    out = common_view_camera(dual)
    assert (out.width, out.height) == (320, 240)
    # mean of event fx (200) and frame fx scaled to 320 (400*0.5=200) = 200
    assert abs(float(out.fx) - 200.0) < 1e-3
    maps = dual_mappings(dual, out)
    assert maps["frame_map_x"].shape == (240, 320)
    assert maps["event_fwd_x"].shape == (240, 320)


def test_dso_format_export():
    cam = read_camera_calib(DUAL_YAML, "cam0").to_model()
    txt = to_dso_format(cam)
    lines = txt.strip().split("\n")
    assert lines[1] == "640 480"
    first = [float(v) for v in lines[0].split()]
    assert abs(first[0] - 400.0 / 640) < 1e-8
    assert len(first) == 8          # 4 intrinsics + 4 distortion


def test_photometric_calib_identity_and_vignette():
    gamma = np.arange(256, dtype=np.float32)
    vig = np.full((4, 4), 0.5, np.float32)
    vig[0, 0] = 1.0
    pc = PhotometricCalib.from_files(gamma, vig)
    img = np.full((4, 4), 100, np.uint8)
    out = np.asarray(pc.correct(img))
    assert abs(out[0, 0] - 100.0) < 1e-3         # vignette max -> unchanged
    assert abs(out[1, 1] - 200.0) < 1e-3         # 1/0.5 gain


def test_png_roundtrip_gray8(tmp_path):
    from slam_eds_tpu.io.image_rw import write_png, read_png
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_roundtrip_gray16_rgb8(tmp_path):
    from slam_eds_tpu.io.image_rw import write_png, read_png
    rng = np.random.default_rng(1)
    img16 = rng.integers(0, 65536, (21, 18), dtype=np.uint16)
    p = str(tmp_path / "g16.png")
    write_png(p, img16)
    np.testing.assert_array_equal(read_png(p), img16)
    rgb = rng.integers(0, 256, (14, 19, 3), dtype=np.uint8)
    p2 = str(tmp_path / "rgb.png")
    write_png(p2, rgb)
    np.testing.assert_array_equal(read_png(p2), rgb)


def test_recorder_writes_tum_files(tmp_path):
    from dataclasses import replace
    from slam_eds_tpu.config import RecorderConfig
    from slam_eds_tpu.io.recorder import Recorder
    from slam_eds_tpu.utils.lie import SE3
    import jax.numpy as jnp

    cfg = RecorderConfig(enabled=True, output_folder=str(tmp_path))
    rec = Recorder(cfg)
    T = SE3.exp(jnp.asarray([0.1, -0.2, 0.3, 0.02, -0.01, 0.04], jnp.float32))
    rec.record_pose(1.5, T)
    rec.record_velocity(1.5, np.array([1, 0, 0, 0, 0, 0.5]))
    pp, vp = rec.flush()
    lines = open(pp).read().strip().split("\n")
    assert len(lines) == 1 and len(lines[0].split()) == 8
    vlines = open(vp).read().strip().split("\n")
    assert len(vlines) == 1 and len(vlines[0].split()) == 7
    # viz dump roundtrips through the PNG codec
    path = rec.save_viz("test_img", np.linspace(0, 1, 64).reshape(8, 8))
    from slam_eds_tpu.io.image_rw import read_png
    assert read_png(path).shape == (8, 8)


def test_png_read_external_encoder(tmp_path):
    """Cross-validate the reader against an adaptively-filtered PNG from a
    real encoder (cv2 uses libpng with Sub/Up/Average/Paeth heuristics)."""
    cv2 = pytest.importorskip("cv2")
    from slam_eds_tpu.io.image_rw import read_png
    rng = np.random.default_rng(7)
    # smooth gradient image: encoders pick non-zero filters for these
    ys, xs = np.mgrid[0:120, 0:160]
    img = (xs * 1.3 + ys * 0.7 + rng.normal(0, 3, (120, 160))).astype(np.uint8)
    p = str(tmp_path / "ext.png")
    assert cv2.imwrite(p, img)
    np.testing.assert_array_equal(read_png(p), img)
    rgb = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    p2 = str(tmp_path / "ext_rgb.png")
    assert cv2.imwrite(p2, rgb[..., ::-1])   # cv2 writes BGR
    np.testing.assert_array_equal(read_png(p2), rgb)


def test_radius_outlier_removal():
    """SOR map filtering (MappingConfig.sor_*, PCL radius outlier removal):
    a dense cluster survives, an isolated point does not."""
    from slam_eds_tpu.io.output_maps import radius_outlier_removal
    rng = np.random.default_rng(0)
    cluster = rng.normal(0, 0.02, (40, 3)).astype(np.float32)
    lone = np.asarray([[5.0, 5.0, 5.0]], np.float32)
    xyz = jnp.asarray(np.concatenate([cluster, lone]))
    valid = jnp.ones(41, bool)
    keep = np.asarray(radius_outlier_removal(xyz, valid, nb_points=5,
                                             radius=0.1))
    assert keep[:40].all()
    assert not keep[40]
    # invalid points never count as neighbors nor survive
    valid2 = valid.at[:20].set(False)
    keep2 = np.asarray(radius_outlier_removal(xyz, valid2, nb_points=30,
                                              radius=1.0))
    assert not keep2[:20].any()
