"""CoarseInitializer equivalent: joint pose+idepth bootstrap on an
analytically rendered tilted textured plane."""
import numpy as np
import jax.numpy as jnp

from slam_eds_tpu.ops import coarse_init as ci
from slam_eds_tpu.utils.cameras import Pinhole
from slam_eds_tpu.utils.image import build_pyramid
from slam_eds_tpu.utils.lie import SE3

H, W = 96, 128
CAM = Pinhole(jnp.float32(100.0), jnp.float32(100.0),
              jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)
N_LEVELS = 4

# plane n.X = d in cam0 coords (tilted -> idepth varies across the image)
PLANE_N = np.asarray([0.25, -0.1, 1.0])
PLANE_N = PLANE_N / np.linalg.norm(PLANE_N)
PLANE_D = 2.0


def _texture(x, y):
    return (np.sin(1.7 * x) * np.cos(2.3 * y) * 40.0
            + np.sin(5.1 * x + 3.7 * y) * 25.0
            + np.sin(11.0 * x - 7.0 * y) * 12.0 + 128.0)


def render(T_c0: SE3):
    """Render the plane from camera pose T_c0 (cam <- cam0/world)."""
    R = np.asarray(T_c0.R)
    t = np.asarray(T_c0.t)
    n1 = R @ PLANE_N
    d1 = PLANE_D + n1 @ t
    vs, us = np.mgrid[0:H, 0:W].astype(np.float64)
    dirs = np.stack([(us - float(CAM.cx)) / float(CAM.fx),
                     (vs - float(CAM.cy)) / float(CAM.fy),
                     np.ones_like(us)], -1)
    lam = d1 / np.maximum(dirs @ n1, 1e-6)
    X1 = dirs * lam[..., None]
    X0 = (X1 - t) @ R            # R^T (X1 - t)
    return _texture(X0[..., 0], X0[..., 1]).astype(np.float32)


def true_idepth(uv):
    dirs = np.stack([(uv[:, 0] - float(CAM.cx)) / float(CAM.fx),
                     (uv[:, 1] - float(CAM.cy)) / float(CAM.fy),
                     np.ones(len(uv))], -1)
    lam = PLANE_D / (dirs @ PLANE_N)
    return 1.0 / (lam * dirs[:, 2])


def _pyr(img):
    levels, _ = build_pyramid(jnp.asarray(img), N_LEVELS)
    return levels


def test_set_first_structure():
    st = ci.set_first(_pyr(render(SE3.identity())))
    assert len(st.levels) == N_LEVELS
    l0 = st.levels[0]
    n = int(np.sum(np.asarray(l0.mask)))
    assert n > 100
    nn = np.asarray(l0.nn)
    assert nn.shape[1] == ci.NUM_NN
    # neighbors of valid points are valid
    mask = np.asarray(l0.mask)
    assert mask[nn[mask]].all()


def test_initializer_recovers_structure_and_pose():
    st = ci.set_first(_pyr(render(SE3.identity())))
    rot = jnp.asarray([0.0015, -0.001, 0.0008], jnp.float32)
    t_dir = np.asarray([0.04, 0.012, -0.02])

    # growing-baseline sequence like a real bootstrap
    initialized = False
    for k in range(1, 7):
        tau = jnp.concatenate([jnp.asarray(t_dir * k, jnp.float32),
                               rot * k])
        T_true = SE3.exp(tau)
        st, initialized = ci.track_frame(st, _pyr(render(T_true)), CAM,
                                         iterations=25)
    assert bool(st.snapped)

    T, uv, idp, ok = ci.extract_result(st)
    okn = np.asarray(ok)
    assert okn.sum() > 80

    # translation direction parity (up to the monocular scale gauge)
    t_est = np.asarray(T.t)
    cos = abs(t_est @ (t_dir * 6) / (np.linalg.norm(t_est)
                                     * np.linalg.norm(t_dir * 6) + 1e-12))
    assert cos > 0.95, (t_est, cos)

    # idepth structure: correlation with the true tilted-plane idepth
    idp_est = np.asarray(idp)[okn]
    idp_true = true_idepth(np.asarray(uv)[okn])
    c = np.corrcoef(idp_est, idp_true)[0, 1]
    assert c > 0.7, c


def test_pipeline_dso_bootstrap():
    """FrameOnlyPipeline with bootstrap='dso' initializes from the pyramid
    initializer and seeds a working BA window."""
    from slam_eds_tpu.config import load_config
    from slam_eds_tpu.models.pipeline import FrameOnlyPipeline

    cfg = load_config({
        "caps": {"max_points_per_kf": 512, "max_immature_per_kf": 512,
                 "max_window_frames": 6, "max_events": 1024},
        "bundles": {"window_size": 4, "min_frames": 3},
        "coarse": {"pyr_levels": 4, "max_iterations": [10, 20, 30, 30]},
        "selector": {"desired_immature_density": 400.0,
                     "desired_point_density": 300.0},
        "initializer": {"pyr_levels": 4},
        "tracker": {"bootstrap": "dso"},
    })
    pipe = FrameOnlyPipeline(CAM, cfg)
    rot = jnp.asarray([0.0015, -0.001, 0.0008], jnp.float32)
    t_dir = np.asarray([0.04, 0.012, -0.02])
    pipe.process_frame(render(SE3.identity()), 0.0)
    for k in range(1, 8):
        tau = jnp.concatenate([jnp.asarray(t_dir * k, jnp.float32), rot * k])
        pipe.process_frame(render(SE3.exp(tau)), 0.1 * k)
        if pipe._initialized:
            break
    assert pipe._initialized
    import slam_eds_tpu.models.ba_state as bs
    n_active = int((np.asarray(pipe.window.state.p_status)
                    == bs.PT_ACTIVE).sum())
    assert n_active > 50
    assert np.isfinite(np.asarray(pipe.window.state.p_idepth)).all()
