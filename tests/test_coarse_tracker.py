import numpy as np
import jax
import jax.numpy as jnp

from slam_eds_tpu.ops import coarse_tracker as ct
from slam_eds_tpu.utils import image
from slam_eds_tpu.utils.cameras import Pinhole, project, backproject
from slam_eds_tpu.utils.lie import SE3


def make_cam(W=128, H=96):
    return Pinhole(jnp.float32(100.0), jnp.float32(100.0),
                   jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)


def textured(rng, H=96, W=128):
    ys, xs = np.mgrid[0:H, 0:W]
    img = (np.sin(xs * 0.23) * np.cos(ys * 0.31)
           + 0.7 * np.sin(xs * 0.071 + ys * 0.053)
           + 0.3 * np.sin(xs * 0.511) * np.sin(ys * 0.437))
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def render_warped(img_ref, cam, pose, idepth):
    """Render the reference image seen from `pose` (inverse warp per target
    pixel using constant scene inverse depth)."""
    H, W = img_ref.shape
    ys, xs = np.mgrid[0:H, 0:W]
    uv = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    xyz = backproject(cam, uv, jnp.full((H * W,), idepth, jnp.float32))
    # target pixel = project(pose @ X_ref); we need ref pixel for each target
    # pixel: invert by warping with pose^-1
    xyz_t = pose.inverse().apply(xyz)
    uv_r = project(cam, xyz_t)
    from slam_eds_tpu.utils.interp import bilinear
    vals = bilinear(jnp.asarray(img_ref), uv_r[:, 0], uv_r[:, 1])
    return np.asarray(vals).reshape(H, W).astype(np.float32)


def build_tpl_from_dense(img_ref, cam, idepth, n_levels=4):
    """Template with every 2nd interior pixel active at known idepth."""
    H, W = img_ref.shape
    ys, xs = np.mgrid[4:H - 4:2, 4:W - 4:2]
    uv = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    n = uv.shape[0]
    pyr, _ = image.build_pyramid(jnp.asarray(img_ref), n_levels)
    tpls = ct.build_template(uv, jnp.full((n,), idepth, jnp.float32),
                             jnp.ones((n,), jnp.float32),
                             jnp.ones((n,), bool), pyr,
                             caps=[4096, 2048, 1024, 512])
    return tpls, pyr


# shared jitted runner: eager track_newest_coarse dispatches thousands of
# tiny ops per call (41 s/test); one compile shared across tests
from functools import partial as _partial


@_partial(jax.jit, static_argnames=("max_iterations",))
def _track_j(tpls, tgt_pyr, cams, pose0, max_iterations):
    return ct.track_newest_coarse(
        tpls, tgt_pyr, cams, pose0, jnp.zeros(2),
        (jnp.float32(1.0), jnp.float32(1.0)), jnp.zeros(2),
        min_res_for_abort=jnp.full((len(cams),), 1e9, jnp.float32),
        max_iterations=max_iterations)


def test_build_template_levels(rng):
    img = textured(rng)
    cam = make_cam()
    tpls, _ = build_tpl_from_dense(img, cam, 0.5)
    for lvl, t in enumerate(tpls):
        assert int(t.mask.sum()) > 50 // (lvl + 1)
        idp = np.asarray(t.idepth)[np.asarray(t.mask)]
        np.testing.assert_allclose(idp, 0.5, atol=1e-4)


def test_track_recovers_known_pose(rng):
    img_ref = textured(rng)
    cam = make_cam()
    idepth = 0.5
    true_pose = SE3.exp(jnp.asarray([0.02, -0.015, 0.01, 0.004, -0.006, 0.003],
                                    jnp.float32))
    img_new = render_warped(img_ref, cam, true_pose, idepth)

    tpls, _ = build_tpl_from_dense(img_ref, cam, idepth)
    tgt_pyr, _ = image.build_pyramid(jnp.asarray(img_new), 4)
    cams = [cam.pyramid_level(l) for l in range(4)]

    res = _track_j(tpls, tgt_pyr, cams, SE3.identity(),
                   max_iterations=(10, 20, 50, 50))
    assert bool(res.ok)
    err = true_pose.inverse().compose(res.pose).log()
    assert float(jnp.linalg.norm(err)) < 2e-3, np.asarray(err)


def test_track_with_affine_change(rng):
    img_ref = textured(rng)
    cam = make_cam()
    idepth = 0.5
    true_pose = SE3.exp(jnp.asarray([0.01, 0.01, -0.005, 0.002, 0.003, -0.002],
                                    jnp.float32))
    img_new = 1.15 * render_warped(img_ref, cam, true_pose, idepth) + 8.0

    tpls, _ = build_tpl_from_dense(img_ref, cam, idepth)
    tgt_pyr, _ = image.build_pyramid(jnp.asarray(img_new), 4)
    cams = [cam.pyramid_level(l) for l in range(4)]
    res = _track_j(tpls, tgt_pyr, cams, SE3.identity(),
                   max_iterations=(10, 20, 50, 50))
    assert bool(res.ok)
    err = true_pose.inverse().compose(res.pose).log()
    assert float(jnp.linalg.norm(err)) < 5e-3, np.asarray(err)
    # recovered affine gain ~ 1.15
    rel = ct.aff_from_to(jnp.float32(1.0), jnp.zeros(2), jnp.float32(1.0),
                         res.aff)
    np.testing.assert_allclose(float(rel[0]), 1.15, atol=0.05)


def test_track_jit_compiles(rng):
    img_ref = textured(rng)
    cam = make_cam()
    tpls, _ = build_tpl_from_dense(img_ref, cam, 0.5)
    tgt_pyr, _ = image.build_pyramid(jnp.asarray(img_ref), 4)
    cams = [cam.pyramid_level(l) for l in range(4)]

    @jax.jit
    def run(tpls, tgt_pyr, pose0):
        return ct.track_newest_coarse(
            tpls, tgt_pyr, cams, pose0, jnp.zeros(2),
            (jnp.float32(1.0), jnp.float32(1.0)), jnp.zeros(2),
            min_res_for_abort=jnp.full((4,), 1e9, jnp.float32),
            max_iterations=(5, 5, 5, 5))

    res = run(tpls, tgt_pyr, SE3.identity())
    assert bool(res.ok)
    # identity warp -> pose stays near identity
    assert float(jnp.linalg.norm(res.pose.log())) < 1e-3


def test_flow_indicators_zero_at_identity(rng):
    img_ref = textured(rng)
    cam = make_cam()
    tpls, _ = build_tpl_from_dense(img_ref, cam, 0.5)
    sT, sR, sRT = ct.flow_indicators(tpls[0], cam, SE3.identity())
    assert float(sT) < 1e-6 and float(sR) < 1e-6 and float(sRT) < 1e-6
