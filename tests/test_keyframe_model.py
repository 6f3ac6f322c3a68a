import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.models import keyframe as kfm
from slam_eds_tpu.utils.cameras import Pinhole

H, W = 96, 128
CAM = Pinhole(jnp.float32(100.0), jnp.float32(100.0), jnp.float32(63.5),
              jnp.float32(47.5), W, H)


def textured(rng):
    ys, xs = np.mgrid[0:H, 0:W]
    img = (np.sin(xs * 0.3) * np.cos(ys * 0.25)
           + 0.5 * np.sin(xs * 0.07 + ys * 0.09)) * 100 + 128
    return img.astype(np.float32)


def test_create_keyframe_basic(rng):
    kf = kfm.create_keyframe(textured(rng), CAM, capacity=512,
                             percent_points=0.5)
    n = int(kf.mask.sum())
    assert 50 < n <= 512
    assert float(kf.img.min()) >= 0.0 and float(kf.img.max()) <= 1.0
    # normalized coords consistent with uv
    m = np.asarray(kf.mask)
    uv = np.asarray(kf.uv)[m]
    nc = np.asarray(kf.norm_coord)[m]
    np.testing.assert_allclose(nc[:, 0], (uv[:, 0] - 63.5) / 100.0, atol=1e-5)
    assert int(kf.n_initial) == n


def test_depth_map_seeding(rng):
    img = textured(rng)
    map_uv = jnp.asarray(np.stack([rng.uniform(0, W, 200),
                                   rng.uniform(0, H, 200)], -1), jnp.float32)
    map_idp = jnp.asarray(rng.uniform(0.3, 0.9, 200), jnp.float32)
    kf = kfm.create_keyframe(img, CAM, capacity=256,
                             depth_map=(map_uv, map_idp,
                                        jnp.ones(200, bool)))
    m = np.asarray(kf.mask)
    idp = np.asarray(kf.idepth)[m]
    assert ((idp >= 0.3) & (idp <= 0.9)).all()
    w = np.asarray(kf.weight)[m]
    assert (w >= 0).all() and (w <= 1).all() and w.max() > 0.5


def test_nn_depth_lookup_exact(rng):
    uv = jnp.asarray([[10.0, 10.0], [50.0, 40.0]], jnp.float32)
    map_uv = jnp.asarray([[10.5, 10.0], [49.0, 40.0], [100.0, 80.0]],
                         jnp.float32)
    map_idp = jnp.asarray([0.5, 0.8, 0.2], jnp.float32)
    idp, w = kfm.nn_depth_lookup(uv, map_uv, map_idp, jnp.ones(3, bool))
    np.testing.assert_allclose(np.asarray(idp), [0.5, 0.8])


def test_clean_and_refine_masks(rng):
    kf = kfm.create_keyframe(textured(rng), CAM, capacity=256)
    kf2 = kf._replace(weight=kf.weight * 0.5)
    cleaned = kfm.clean_points(kf2, 0.7)
    assert int(cleaned.mask.sum()) == 0
    # event activity only on left half
    ev = jnp.zeros((H, W), jnp.float32).at[:, : W // 2].set(0.1)
    refined = kfm.points_refinement(kf, ev)
    uv = np.asarray(kf.uv)
    m0 = np.asarray(kf.mask)
    m1 = np.asarray(refined.mask)
    # surviving points on the left; right-half points dropped
    assert m1.sum() < m0.sum()
    assert (uv[m1][:, 0] < W // 2 + 3).all()


def test_need_new_kf(rng):
    kf = kfm.create_keyframe(textured(rng), CAM, capacity=256)
    assert not bool(kfm.need_new_kf(kf, 0.3))
    # kill half the points
    idx = np.where(np.asarray(kf.mask))[0]
    new_mask = np.asarray(kf.mask).copy()
    new_mask[idx[: len(idx) // 2]] = False
    assert bool(kfm.need_new_kf(kf._replace(mask=jnp.asarray(new_mask)), 0.3))


def test_sparse_model_and_image(rng):
    kf = kfm.create_keyframe(textured(rng), CAM, capacity=256)
    vx = jnp.asarray([0.3, 0.1, -0.2, 0.02, -0.01, 0.03], jnp.float32)
    m = kfm.sparse_model(kf, vx)
    assert abs(float(jnp.linalg.norm(m)) - 1.0) < 0.05  # ~unit normalized
    img = kfm.model_image(kf, vx, H, W)
    assert img.shape == (H, W)
    assert np.isfinite(np.asarray(img)).all()


def test_export_map(rng):
    kf = kfm.create_keyframe(textured(rng), CAM, capacity=128,
                             init_depth=2.0)
    xyz, color, mask = kfm.export_map(kf, CAM)
    z = np.asarray(xyz)[np.asarray(mask)][:, 2]
    np.testing.assert_allclose(z, 2.0, atol=1e-4)


def test_kf_selection_criteria():
    from slam_eds_tpu.utils.lie import SE3

    small = SE3.exp(jnp.asarray([0.01, 0, 0, 0.01, 0, 0], jnp.float32))
    big_t = SE3.exp(jnp.asarray([0.3, 0, 0, 0, 0, 0], jnp.float32))
    big_r = SE3.exp(jnp.asarray([0, 0, 0, 0.2, 0, 0], jnp.float32))
    # occlusion: ||t||/depth ratio (Utils.hpp:292-299)
    assert not bool(kfm.kf_selection_occlusion(small, 1.0))
    assert bool(kfm.kf_selection_occlusion(big_t, 1.0))
    assert not bool(kfm.kf_selection_occlusion(big_t, 10.0))
    # rotation: angle > 5deg/3 (Utils.hpp:301-308)
    assert not bool(kfm.kf_selection_rotation(small))
    assert bool(kfm.kf_selection_rotation(big_r))
    # translation: ||t|| > 5cm (Utils.hpp:310-315)
    assert not bool(kfm.kf_selection_translation(small))
    assert bool(kfm.kf_selection_translation(big_t))


def test_idepth_map_from_depth_image():
    """IDepthMap-from-depth-image conversion (mapping/Types.hpp:109-276)."""
    from slam_eds_tpu.models.keyframe import idepth_map_from_depth_image
    d = np.full((32, 40), 2.0, np.float32)
    d[0, 0] = -1.0         # invalid
    d[4, 8] = 4.0
    uv, idp, mask = idepth_map_from_depth_image(jnp.asarray(d), stride=4)
    uv, idp, mask = map(np.asarray, (uv, idp, mask))
    assert uv.shape[0] == 8 * 10
    assert not mask[0]                     # the invalid corner
    i = np.where((uv[:, 0] == 8) & (uv[:, 1] == 4))[0][0]
    assert mask[i] and abs(idp[i] - 0.25) < 1e-6
    assert np.allclose(idp[mask][idp[mask] != 0.25], 0.5)


def test_idepth_map_from_pointcloud():
    from slam_eds_tpu.models.keyframe import idepth_map_from_pointcloud
    from slam_eds_tpu.utils.cameras import Pinhole
    from slam_eds_tpu.utils.lie import SE3
    cam = Pinhole(jnp.float32(100.0), jnp.float32(100.0), jnp.float32(31.5),
                  jnp.float32(23.5), 64, 48)
    Xw = jnp.asarray([[0.0, 0.0, 2.0],     # center, depth 2
                      [0.0, 0.0, -1.0],    # behind camera
                      [10.0, 0.0, 2.0]])   # projects far outside
    uv, idp, mask = idepth_map_from_pointcloud(Xw, SE3.identity(), cam)
    uv, idp, mask = map(np.asarray, (uv, idp, mask))
    assert mask[0] and not mask[1] and not mask[2]
    assert np.allclose(uv[0], [31.5, 23.5], atol=1e-4)
    assert abs(idp[0] - 0.5) < 1e-6
